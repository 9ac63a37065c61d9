#!/usr/bin/env python3
"""Dev-side provenance hygiene scan (NOT part of the engine).

Greps every git-tracked text file for markers that would indicate
non-public content leaking into the repo: imports outside the declared
public dependency surface, non-public URLs/hosts, cloud bucket paths,
chat permalinks, credential-shaped strings, and suspicious environment
variables. The engine must derive from public knowledge only (the Spark
API/source, the public reference repo, published papers), so every
category is expected to stay empty; the artifact exists to prove the
scan ran, with provenance, rather than to find anything.

Usage: python3 tools/leakcheck.py <round_n> [--json LEAKCHECK.json]
"""
import json, re, subprocess, sys, datetime

round_n = int(sys.argv[1]) if len(sys.argv) > 1 else 0
json_out = sys.argv[sys.argv.index("--json") + 1] if "--json" in sys.argv else None

# Public surface: everything the build is allowed to touch.
PUBLIC_IMPORT_ROOTS = (
    "org.apache", "scala", "java", "javax", "graft", "org.scalatest",
    "org.scalacheck", "com.fasterxml", "org.slf4j", "org.codehaus")
PUBLIC_HOSTS = (
    "apache.org", "github.com", "scala-lang.org", "scala-sbt.org",
    "arxiv.org", "w3.org", "duckdb.org", "example.com", "localhost",
    "opensource.org", "maven.org", "wikipedia.org", "doi.org", "acm.org")

CHECKS = {
    # Scala/Java imports whose root package is outside the public build
    # (val-scoped `x.implicits._` imports are Spark session idiom, not
    # packages; the check applies to .scala/.sbt files only — see below)
    "internal-import": re.compile(
        r"^\s*import\s+(?!(?:%s)[.\s])[a-z][\w.]+(?<!\.implicits\._)(?<!\.implicits)\s*$" %
        "|".join(re.escape(r) for r in PUBLIC_IMPORT_ROOTS), re.M),
    # URLs pointing at hosts not on the public allowlist
    "internal-url": re.compile(
        r"https?://(?!(?:[\w.-]*\.)?(?:%s))[\w.-]+\.[a-z]{2,}" %
        "|".join(re.escape(h) for h in PUBLIC_HOSTS)),
    # Maven-style coordinates outside the declared dependency set
    "internal-pkg2": re.compile(
        r'"(?!org\.apache|org\.scala|org\.scalatest|org\.scalacheck)'
        r'[a-z][\w.-]+"\s*%%?\s*"[\w.-]+"\s*%\s*"'),
    # Cloud storage paths (none are public knowledge for this build)
    "internal-bucket": re.compile(r"\b(?:s3a?|gs|abfss?|wasbs?)://[\w./-]+"),
    # Chat permalinks
    "slack-link": re.compile(r"[\w-]+\.slack\.com/|slack://"),
    # Credential-shaped strings (AWS key ids, bearer/private-key blocks)
    "api-key": re.compile(
        r"\bAKIA[0-9A-Z]{16}\b|-----BEGIN [A-Z ]*PRIVATE KEY-----|"
        r"\b(?:api|secret)[_-]?key\s*[:=]\s*['\"][A-Za-z0-9+/]{20,}"),
    # Environment variables outside the repo's own SPARK_GRAFT_*/standard set
    "axon-env": re.compile(
        r"sys\.env(?:\.getOrElse)?\(\s*\"(?!SPARK_GRAFT_|JAVA_|SPARK_|HOME|PATH|TZ|USER)[A-Z][A-Z0-9_]*\""),
}

files = subprocess.check_output(["git", "ls-files"]).decode().splitlines()
hits = {k: [] for k in CHECKS}
scanned = 0
for path in files:
    if re.search(r"\.(parquet|orc|png|jar|class)$", path) or path == "tools/leakcheck.py":
        continue
    try:
        text = open(path, encoding="utf-8", errors="replace").read()
    except OSError:
        continue
    scanned += 1
    for cat, rx in CHECKS.items():
        if cat == "internal-import" and not re.search(r"\.(scala|sbt)$", path):
            continue
        for m in rx.finditer(text):
            line = text.count("\n", 0, m.start()) + 1
            hits[cat].append(f"{path}:{line}: {m.group(0)[:120]}")

commit = subprocess.check_output(["git", "rev-parse", "--short", "HEAD"]).decode().strip()
report = {
    "round": round_n,
    "n_hits": sum(len(v) for v in hits.values()),
    "hits": hits,
    "provenance": {
        "generator": "tools/leakcheck.py",
        "commit": commit,
        "date": datetime.date.today().isoformat(),
        "files_scanned": scanned,
    },
}
out = json.dumps(report, indent=2)
if json_out:
    open(json_out, "w").write(out + "\n")
print(out if report["n_hits"] else
      f"round {round_n}: 0 hits across {len(CHECKS)} categories, {scanned} files (commit {commit})")
sys.exit(1 if report["n_hits"] else 0)
