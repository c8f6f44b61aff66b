#!/bin/bash
# Dump formatted physical plans for named queries into per-query files.
# Usage: [TOOL=PlanAudit|PlanTrace] tools/dump_plans.sh <outdir> <suffix> <query> [query...]
# Writes <outdir>/<query>_<suffix>.txt for each query.
set -e
OUT=$1; SUFFIX=$2; shift 2
TOOL=${TOOL:-PlanAudit}
mkdir -p "$OUT"
TMP=$(mktemp)
sbt -batch "runMain graft.tools.$TOOL /root/testdata/sf0.01 $*" > "$TMP" 2>&1
python3 - "$TMP" "$OUT" "$SUFFIX" <<'EOF'
import sys, re
tmp, out, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
text = open(tmp).read()
# strip sbt log prefixes
lines = [re.sub(r'^\[(info|error)\] ', '', l) for l in text.splitlines()]
cur, buf = None, []
def flush():
    if cur and buf:
        open(f"{out}/{cur}_{suffix}.txt", "w").write("\n".join(buf).strip() + "\n")
for l in lines:
    # query markers only — formatted explain output itself contains a
    # "===== Subqueries =====" section header that must NOT split files
    m = re.match(r'^===== (q[0-9]\S*) =====$', l.strip())
    if m:
        flush(); cur, buf = m.group(1), []
    elif cur is not None:
        buf.append(l)
flush()
print("wrote plans to", out)
EOF
rm -f "$TMP"
