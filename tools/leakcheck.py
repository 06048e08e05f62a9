#!/usr/bin/env python3
"""Round-stamped leak check (r17 verdict item 2: make round-end artifact
hygiene mechanical). Greps the repo's source + docs for reference-infra /
internal-looking strings and writes LEAKCHECK.json with the CURRENT round
number (parsed as VERDICT.md's round + 1, the same constant
BenchCoverageSpec asserts against) — so a stale committed artifact fails
`sbt test` instead of needing a judge to notice.

Usage: python3 tools/leakcheck.py [repo_root]
"""
import json, os, re, sys

CATEGORIES = {
    # reference deployment infra (the reference repo is OKE/OCI Terraform)
    "internal-import": r"import\s+(com\.oracle|oracle\.bmc|com\.datastax\.oss\.driver)",
    "internal-url": r"(oraclecloud\.com|objectstorage\.[a-z0-9-]+\.oci|adb\.[a-z0-9-]+\.oraclecloud)",
    "internal-pkg2": r"(k8ssandra|oci://|ocid1\.)",
    "internal-bucket": r"(s3://[a-z0-9-]*internal|gs://[a-z0-9-]*internal|bucket\.oraclecloud)",
    "slack-link": r"(slack\.com/archives|#claude|anthropic)",
    "api-key": r"(AKIA[0-9A-Z]{16}|api[_-]?key\s*[:=]\s*['\"][A-Za-z0-9]{16,})",
    "axon-env": r"(AXON_|CLAUDE_INTERNAL|ANTHROPIC_API)",
}

SCAN_DIRS = ["src", "tools"]
SCAN_FILES = ["SURVEY.md", "README.md", "build.sbt", "FIXTURES.md"]


def round_number(root):
    try:
        with open(os.path.join(root, "VERDICT.md")) as f:
            m = re.search(r"round\s+(\d+)", f.read(2000))
            return int(m.group(1)) + 1 if m else 1
    except FileNotFoundError:
        return 1


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/root/repo"
    paths = []
    for d in SCAN_DIRS:
        for dirpath, _, names in os.walk(os.path.join(root, d)):
            paths += [os.path.join(dirpath, n) for n in names
                      if n.endswith((".scala", ".py", ".sbt", ".md", ".conf"))]
    paths += [os.path.join(root, f) for f in SCAN_FILES
              if os.path.exists(os.path.join(root, f))]
    hits = {k: [] for k in CATEGORIES}
    for p in paths:
        rel = os.path.relpath(p, root)
        if rel == os.path.join("tools", "leakcheck.py"):
            continue  # the pattern table itself is not a leak
        # .md prose may legitimately DESCRIBE the reference's deployment
        # stack (SURVEY documents what cloudinit.sh provisions); only code
        # can actually depend on it, so pkg/import checks are code-only
        code = not rel.endswith(".md")
        for i, line in enumerate(open(p, errors="replace").read()
                                  .splitlines(), 1):
            for cat, pat in CATEGORIES.items():
                if cat in ("internal-import", "internal-pkg2") and not code:
                    continue
                if re.search(pat, line, re.IGNORECASE):
                    hits[cat].append(f"{rel}:{i}")
    doc = {
        "round": round_number(root),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    out = os.path.join(root, "LEAKCHECK.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")
    print(json.dumps({"round": doc["round"], "n_hits": doc["n_hits"]}))
    if doc["n_hits"]:
        for cat, v in hits.items():
            for h in v:
                print(f"  {cat}: {h}")
        sys.exit(1)


if __name__ == "__main__":
    main()
