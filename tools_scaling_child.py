"""Helper: run one scaling measurement level (see bench_scaling.py)."""
import json
import sys

sys.path.insert(0, "/root/repo")
import bench_scaling as bs  # noqa: E402

if __name__ == "__main__":
    print(json.dumps(bs.run_at(int(sys.argv[1]))))
