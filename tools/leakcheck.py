#!/usr/bin/env python3
"""Leak check: scan the repo for anything that isn't public knowledge.

Usage: python3 tools/leakcheck.py [repo_root]

Scans every tracked text file for markers of non-public surface —
internal-looking package imports, private hostnames/URLs, cloud bucket
URIs, chat permalinks, credential-shaped strings, and
internal-environment variable prefixes. The engine is built ONLY from
the Apache Spark API, the public reference repo, and published papers;
any hit here is a build-blocking defect, not a style issue.

Writes LEAKCHECK.json at the repo root with a run stamp (UTC time +
current commit) so a fresh run is distinguishable from a hand-edited
round bump, and exits 1 on any hit.
"""
import json
import os
import re
import subprocess
import sys
from datetime import datetime, timezone

CATEGORIES = {
    # import/package surface that is not Spark/Scala/Java/standard libs
    # and not this repo's own `graft` namespace
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache\.|org\.scalatest|org\.scalacheck"
        r"|scala\.|java\.|javax\.|graft\.|spark\.implicits)"
        r"(com|net|io|ai|dev)\.[a-z]", re.MULTILINE),
    # private-looking hosts (public docs/spec hosts allowed)
    # public doc/spec hosts, the reference's own public subject domains
    # (imdb/metacritic), and the repo's synthetic URL fixtures (example
    # .com in any case, the one-letter x.io planted in URL-canon tests)
    "internal-url": re.compile(
        r"https?://(?!github\.com|raw\.githubusercontent\.com"
        r"|spark\.apache\.org|www\.w3\.org|duckdb\.org|arxiv\.org"
        r"|doi\.org|www\.ietf\.org|datatracker\.ietf\.org|www\.iso\.org"
        r"|docs\.oracle\.com|localhost|127\.0\.0\.1|example\.com"
        r"|(?:www\.)?imdb\.com|(?:www\.)?metacritic\.com|x\.io)"
        r"[A-Za-z0-9.-]+\.[a-z]{2,}", re.IGNORECASE),
    "internal-pkg2": re.compile(
        r"\b(?:internal|corp|proprietary)[-_.](?:api|sdk|client|repo)\b",
        re.IGNORECASE),
    "internal-bucket": re.compile(r"\b(?:s3|gs|abfss?)://[a-z0-9][a-z0-9.-]+"),
    "slack-link": re.compile(
        r"\b[a-z0-9-]+\.slack\.com\b|\bslack://|\bgo/[a-z][a-z0-9-]{1,30}\b"),
    "api-key": re.compile(
        r"\b(?:sk|pk|key|token)[-_][A-Za-z0-9]{20,}\b|AKIA[0-9A-Z]{16}"),
    "axon-env": re.compile(r"\b[A-Z]+_(?:INTERNAL|CORP|PROD)_[A-Z_]+\b"),
}

SCAN_EXT = {".scala", ".sbt", ".py", ".md", ".json", ".txt", ".sql",
            ".yaml", ".yml", ".sh", ".properties", ".conf"}
SKIP = {"LEAKCHECK.json"}  # the report itself names the patterns


def tracked_files(root):
    out = subprocess.run(["git", "-C", root, "ls-files"],
                         capture_output=True, text=True, check=True).stdout
    return [f for f in out.splitlines()
            if os.path.splitext(f)[1] in SCAN_EXT and
            os.path.basename(f) not in SKIP and f != "tools/leakcheck.py"]


def main(root):
    hits = {k: [] for k in CATEGORIES}
    for rel in tracked_files(root):
        path = os.path.join(root, rel)
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for cat, rx in CATEGORIES.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{rel}:{line}:{m.group(0)[:80]}")
    n = sum(len(v) for v in hits.values())
    commit = subprocess.run(["git", "-C", root, "rev-parse", "HEAD"],
                            capture_output=True, text=True).stdout.strip()
    report = {
        "run_utc": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        "commit": commit,
        "n_files_scanned": len(tracked_files(root)),
        "n_hits": n,
        "hits": hits,
    }
    with open(os.path.join(root, "LEAKCHECK.json"), "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(f"leakcheck: {n} hits across {report['n_files_scanned']} files"
          f" (report: LEAKCHECK.json)")
    for cat, v in hits.items():
        for h in v:
            print(f"  HIT [{cat}] {h}")
    sys.exit(1 if n else 0)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".")
