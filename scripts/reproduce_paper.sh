#!/usr/bin/env bash
# Reproduce the STAR-GCN paper experiment matrix (IJCAI 2019).
#
# Point STARGCN_DATA_ROOT at the MovieLens root and this script runs
# all 15 shipped configs and tabulates test RMSE against the paper
# numbers (BASELINE.md).  In an egress-present environment the loader
# auto-downloads + extracts the GroupLens archives into that root on
# first use (stargcn_tpu/data/download.py); offline, pre-place the
# extracted archives:
#
#   $STARGCN_DATA_ROOT/ml-100k/     (u.user, u.item, u1.base, u1.test, u.data)
#   $STARGCN_DATA_ROOT/ml-1m/       (users.dat, movies.dat, ratings.dat)
#   $STARGCN_DATA_ROOT/ml-10M100K/  (movies.dat, ratings.dat)
#
# Optional: $STARGCN_GLOVE_PATH points at glove.840B.300d.txt for real
# title embeddings (hash-based fallback features are used otherwise);
# `python -m stargcn_tpu.data.download glove` pre-fetches it.
#
# Usage:
#   STARGCN_DATA_ROOT=/data ./scripts/reproduce_paper.sh [results_dir]
#
# Paper targets (reference README.md:2 -> ijcai.org/proceedings/2019/0592):
#   transductive ml-100k  RMSE ~ 0.895
#   transductive ml-1m    RMSE ~ 0.832
#   transductive ml-10m   RMSE ~ 0.770
#   inductive ml-100k/ml-1m user/item x 10/30/50%: paper Tables 3-4.

set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
DATA_ROOT="${STARGCN_DATA_ROOT:?set STARGCN_DATA_ROOT to the MovieLens root}"
OUT="${1:-$REPO/runs/paper_repro}"
mkdir -p "$OUT"

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$REPO/.jax_cache}"

# Pre-flight: hard-gate every dataset against its published invariants
# (ratings/users/items/levels counts — stargcn_tpu/data/invariants.py)
# so a truncated or mis-extracted archive fails HERE, not as a silently
# wrong RMSE hours later.
for ds in ml-100k ml-1m ml-10m; do
    echo "=== pre-flight: $ds invariants ==="
    python -m stargcn_tpu.data.invariants "$ds" "$DATA_ROOT"
done

SUMMARY="$OUT/summary.tsv"
echo -e "config\tbest_iter\tbest_valid_rmse\tbest_test_rmse\tpaper_rmse" > "$SUMMARY"

paper_target() {
    case "$1" in
        transductive_ml_100k) echo 0.895 ;;
        transductive_ml_1m)   echo 0.832 ;;
        transductive_ml_10m)  echo 0.770 ;;
        *)                    echo "tables3-4" ;;
    esac
}

for cfg in "$REPO"/configs/*.yml; do
    name="$(basename "$cfg" .yml)"
    echo "=== $name ==="
    inductive_flag=""
    case "$name" in inductive_*) inductive_flag="--inductive" ;; esac
    python "$REPO/experiments/train.py" \
        --cfg "$cfg" \
        --data_root "$DATA_ROOT" \
        --save_dir "$OUT/$name" \
        $inductive_flag \
        2>&1 | tee "$OUT/$name.out" | tail -2
    # result line: "result: {'best_iter': ..., 'best_test_rmse': [...]}"
    python - "$name" "$OUT" "$SUMMARY" "$(paper_target "$name")" <<'EOF'
import ast
import re
import sys

name, out, summary, paper = sys.argv[1:5]
text = open(f"{out}/{name}.out").read()
m = re.findall(r"result: (\{.*\})", text)
row = ast.literal_eval(m[-1]) if m else {}
test = row.get("best_test_rmse")
test_s = f"{test[-1]:.4f}" if test else "n/a"
with open(summary, "a") as f:
    f.write(f"{name}\t{row.get('best_iter', -1)}\t"
            f"{row.get('best_valid_rmse', float('nan')):.4f}\t"
            f"{test_s}\t{paper}\n")
EOF
done

echo
echo "==== paper reproduction summary ===="
column -t "$SUMMARY"
