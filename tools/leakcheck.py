#!/usr/bin/env python3
"""Self-evidencing leak scan: grep every tracked file for
internal/proprietary reference patterns and emit a JSON artifact that
PROVES its own coverage (file count, byte count, commit hash, pattern
list) — "0 hits" from a scan that names what it scanned, not a bare
zero. Builder-side twin of the driver's LEAKCHECK; run per round:

    python3 tools/leakcheck.py LEAKCHECK_r13.json
"""
import json
import re
import subprocess
import sys

PATTERNS = {
    # imports outside the public surface (spark/java/scala/this repo)
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache\.|java\.|"
        r"javax\.|scala\.|graft\.|org\.scalatest|org\.scalacheck|"
        r"[a-z][a-z0-9_]*\.(sparkSession\.)?implicits)"
        r"[a-z][a-z0-9_]*\.[a-z]", re.M),
    # URLs outside public hosts / RFC 2606 reserved domains
    "internal-url": re.compile(
        r"https?://(?!localhost|127\.0\.0\.1|"
        r"[a-z0-9.-]*\.(example|test|invalid)\b|example\.(com|org|net)|"
        r"[a-z0-9.-]*\b(apache|github|arxiv|duckdb|wikipedia|scala-lang|"
        r"scalatest|python|w3|ietf|nyc|amazonaws\.com/nyc-tlc)\b)"
        r"[a-z0-9.-]+\.[a-z]{2,}"),
    # cloud bucket or internal-looking resource schemes
    "internal-bucket": re.compile(r"\b(s3|gs|hdfs)://(?!nyc-tlc|bucket|"
                                  r"example|path|your-)[a-z0-9._-]{3,}"),
    "slack-link": re.compile(r"\b(slack\.com/archives|app\.slack\.com|"
                             r"go/[a-z][a-z0-9-]{1,30}\b)"),
    "api-key": re.compile(r"\b(sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|"
                          r"ghp_[A-Za-z0-9]{20,})\b"),
    # env vars beyond the project's own SPARK_GRAFT_* / standard ones
    "env-var": re.compile(r"sys\.env\s*[.(]\s*(?:get|getOrElse|apply)?"
                          r"\(?\s*\"(?!SPARK_|HOME|PATH|USER|TZ|"
                          r"JAVA_|COURSIER)[A-Z][A-Z0-9_]*\""),
}


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "LEAKCHECK_self.json"
    files = subprocess.run(
        ["git", "ls-files"], capture_output=True, text=True, check=True
    ).stdout.split()
    commit = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
        check=True).stdout.strip()
    hits = {k: [] for k in PATTERNS}
    n_files = 0
    n_bytes = 0
    skipped = []
    for f in files:
        try:
            with open(f, "rb") as fh:
                raw = fh.read()
        except OSError:
            skipped.append(f)
            continue
        n_files += 1
        n_bytes += len(raw)
        if b"\x00" in raw[:4096]:
            continue  # binary: counted as scanned bytes, not text-matched
        text = raw.decode("utf-8", errors="replace")
        for name, pat in PATTERNS.items():
            for m in pat.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[name].append(f"{f}:{line}: {m.group(0)[:120]}")
    report = {
        "commit": commit,
        "n_files_scanned": n_files,
        "n_bytes_scanned": n_bytes,
        "n_files_skipped": len(skipped),
        "skipped": skipped,
        "patterns": {k: v.pattern for k, v in PATTERNS.items()},
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=2)
    print(f"scanned {n_files} files / {n_bytes} bytes at {commit[:12]}: "
          f"{report['n_hits']} hits -> {out_path}")
    return 0 if report["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
