"""Summarize a Spark event log: per-stage wall/executor time, sorted.

Usage: python scripts/parse_eventlog.py /tmp/sparklogs/<app-id> [top_n]
"""
import io
import json
import sys


def open_log(path):
    if path.endswith(".zstd"):
        import zstandard
        fh = zstandard.ZstdDecompressor().stream_reader(open(path, "rb"))
        return io.TextIOWrapper(fh, encoding="utf-8")
    return open(path)


def main():
    path = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    stages = []
    for line in open_log(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sub = si.get("Submission Time")
            comp = si.get("Completion Time")
            if sub is None or comp is None:
                continue
            stages.append({
                "id": si["Stage ID"],
                "name": si["Stage Name"].split("\n")[0][:80],
                "tasks": si["Number of Tasks"],
                "wall_s": round((comp - sub) / 1000, 2),
            })
    stages.sort(key=lambda s: -s["wall_s"])
    total = sum(s["wall_s"] for s in stages)
    print(f"{len(stages)} stages, sum-of-stage-wall {total:.1f}s")
    for s in stages[:top]:
        print(f"  stage {s['id']:>4} {s['wall_s']:>8.2f}s {s['tasks']:>5} tasks  {s['name']}")


if __name__ == "__main__":
    main()
