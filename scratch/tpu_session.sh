#!/bin/bash
# Round-4 TPU session: run when the axon tunnel is back.
#   bash scratch/tpu_session.sh 2>&1 | tee /tmp/tpu_session.log
# Sequence (each step logs; read results before flipping flag defaults):
#   1. wrap-around msm_win validation (kernel + proof byte equality)
#   2. flotilla + tiering equivalence via bench stage 5 on a small stage set
#   3. batched B/waves sweep with timing breakdown
#   4. full bench
set -x
cd "$(dirname "$0")/.."

echo "=== 1. wraparound validation ==="
timeout 1800 python scratch/validate_wrapmsm.py || exit 1

echo "=== 2. new-flag equivalence (stage 2 + 5 only: small circuits) ==="
BENCH_STAGE=2 BENCH_EQUIV=1 timeout 2400 python - <<'EOF'
import bench
from bulletproofs_r1cs_gadgets_tpu.ops.pallas_backend import PallasBackend
backend = PallasBackend()
bench.stage5_equiv_gate(backend)
EOF

echo "=== 3. batch sweep ==="
BPTPU_TIMING=1 timeout 3600 python scratch/probe_batch_r4.py "12:3,16:4,20:5"

echo "=== 4. full bench ==="
timeout 1800 python bench.py
