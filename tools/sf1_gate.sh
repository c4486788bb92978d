#!/bin/bash
# Full sf1 correctness gate: stock DuckDB oracles for every oracle-bearing
# query except the closure/cliff set, which routes through the hybrid
# checker (cc_oracle_check.py: third-implementation closures + chunked
# winnowing/neardup twins). Merges both reports into CORRECTNESS_sf1.json.
# Usage: sf1_gate.sh <sfDir> <verifyOutDir>
set -e
SF=${1:-/tmp/sf1}; OUT=${2:-/tmp/verify_sf1}
cd /root/repo
HYBRID="dd_simhash_clusters,dd_simhash_clusters_stars,dd_pagerank,dd_survivors,td_soft_dedup,dd_ktruss,mm_blob_clusters,dd_winnowing,vs_emb_neardup"
ONLY=$(python3 - "$OUT" "$HYBRID" <<'PY'
import json, sys
names = sorted(json.load(open(f"{sys.argv[1]}/oracle_sql.json")))
hy = set(sys.argv[2].split(","))
print(",".join(n for n in names if n not in hy))
PY
)
python3 tools/oracle_check.py "$SF" "$OUT" /tmp/corr_sf1_stock.json "$ONLY"
rm -rf /tmp/corr_sf1_cc && mkdir -p /tmp/corr_sf1_cc
python3 tools/cc_oracle_check.py "$SF" "$OUT" /tmp/corr_sf1_cc
python3 - <<'PY'
import json, glob
merged = json.load(open("/tmp/corr_sf1_stock.json"))
for f in glob.glob("/tmp/corr_sf1_cc/*.json"):
    merged.update(json.load(open(f)))
with open("CORRECTNESS_sf1.json", "w") as out:
    json.dump(merged, out, indent=1, sort_keys=True)
bad = [k for k, v in merged.items()
       if not (v["rows_match"] and v["schema_match"] and v["hash_match"])]
print(f"[sf1-gate] {len(merged)} entries, non-green: {bad}")
PY
