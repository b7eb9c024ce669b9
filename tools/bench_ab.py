#!/usr/bin/env python3
"""Shared-box variance adjudication for driver bench results (dev tooling).

Three rounds in a row, the driver's per-round bench recorded >2x
slowdowns that a fresh isolated run showed to be box contention, not
plan regressions. This script codifies that by-hand A/B:

  1. diff two driver bench artifacts (BENCH_r{A}.json vs BENCH_r{B}.json),
  2. flag queries whose recorded time regressed by more than --threshold,
  3. re-measure exactly those queries in isolation (SPARK_GRAFT_BENCH_ONLY
     + SPARK_GRAFT_BENCH_REPS, min of N reps — graft.Bench's dev filter),
  4. write BENCH_AB_r{B}.json: per query {prev, curr, ratio, isolated_min,
     verdict}, verdict = "box-noise" if the isolated time is within
     --tolerance of the previous recording (or better), else "regression".

Usage:
  python3 tools/bench_ab.py                  # two latest BENCH_r*.json
  python3 tools/bench_ab.py --baseline BENCH_r05.json --current BENCH_r06.json
  python3 tools/bench_ab.py --reps 5 --threshold 1.5 --dry-run
"""
import argparse, glob, json, os, re, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_queries(path):
    """Per-query seconds from a bench artifact: either the raw one-line
    {"queries": {...}} graft.Bench prints, or the driver wrapper whose
    `tail` holds that line among log noise."""
    d = json.load(open(path))
    if "queries" in d:
        return d["queries"]
    for ln in reversed(d.get("tail", "").splitlines()):
        ln = ln.strip()
        # the JSON line may be glued to a log prefix; find the outermost {
        i = ln.find('{"metric"')
        if i >= 0:
            try:
                return json.loads(ln[i:])["queries"]
            except (json.JSONDecodeError, KeyError):
                continue
    raise SystemExit(f"no bench queries found in {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", help="previous round's BENCH json")
    ap.add_argument("--current", help="this round's BENCH json")
    ap.add_argument("--threshold", type=float, default=2.0,
                    help="flag curr/prev above this ratio (default 2.0)")
    ap.add_argument("--tolerance", type=float, default=1.1,
                    help="isolated <= prev*tolerance => box-noise (1.1)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--dry-run", action="store_true",
                    help="report flagged queries, skip the isolated run")
    args = ap.parse_args()

    benches = sorted(glob.glob(os.path.join(REPO, "BENCH_r[0-9]*.json")))
    if not (args.baseline and args.current):
        if len(benches) < 2:
            raise SystemExit("need two BENCH_r*.json artifacts to diff")
        args.baseline, args.current = benches[-2], benches[-1]
    prev_q = load_queries(args.baseline)
    curr_q = load_queries(args.current)

    flagged = {}
    for name, curr in curr_q.items():
        prev = prev_q.get(name)
        if prev and prev > 0 and curr / prev > args.threshold:
            flagged[name] = {"prev": prev, "curr": curr,
                             "ratio": round(curr / prev, 2)}
    print(f"{len(flagged)} queries regressed >{args.threshold}x "
          f"({os.path.basename(args.baseline)} -> "
          f"{os.path.basename(args.current)}): "
          f"{sorted(flagged) or 'none'}")

    # Name the evidence file for the round DOING the adjudication — one
    # past the bench artifact being adjudicated (r13's regressions are
    # adjudicated during r14 and belong in BENCH_AB_r14.json). Never
    # clobber an existing file: committed AB evidence is history.
    rnd = re.search(r"BENCH_r(\d+)", os.path.basename(args.current))
    out_path = os.path.join(
        REPO, f"BENCH_AB_r{int(rnd.group(1)) + 1 if rnd else 'X'}.json")
    if os.path.exists(out_path):
        raise SystemExit(
            f"{out_path} already exists — it is committed evidence; "
            "merge results by hand or move it aside first")
    result = {"baseline": os.path.basename(args.baseline),
              "current": os.path.basename(args.current),
              "threshold": args.threshold, "reps": args.reps,
              "flagged": flagged}

    if flagged and not args.dry_run:
        env = dict(os.environ,
                   SPARK_GRAFT_BENCH_ONLY=",".join(sorted(flagged)),
                   SPARK_GRAFT_BENCH_REPS=str(args.reps),
                   SPARK_GRAFT_SF_DIR=args.sf_dir,
                   SPARK_GRAFT_CPUS=args.cpus)
        proc = subprocess.run(
            ["sbt", "-batch", "runMain graft.Bench"],
            cwd=REPO, env=env, capture_output=True, text=True)
        last = [l for l in proc.stdout.splitlines()
                if l.strip().startswith('{"metric"')]
        if proc.returncode != 0 or not last:
            sys.stderr.write(proc.stdout[-1500:] + proc.stderr[-1500:])
            raise SystemExit("isolated bench run failed")
        isolated = json.loads(last[-1])["queries"]
        for name, row in flagged.items():
            iso = isolated.get(name)
            row["isolated_min"] = iso
            row["verdict"] = (
                "missing" if iso is None else
                "box-noise" if iso <= row["prev"] * args.tolerance else
                "regression")
        bad = [n for n, r in flagged.items() if r["verdict"] == "regression"]
        print(f"verdicts: {sum(r['verdict'] == 'box-noise' for r in flagged.values())} "
              f"box-noise, {len(bad)} regression{': ' + str(sorted(bad)) if bad else ''}")

    json.dump(result, open(out_path, "w"), indent=1, sort_keys=True)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
