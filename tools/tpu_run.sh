#!/bin/bash
# Serialize TPU work against the flaky tunnel: probe with a tiny op until the
# device responds, then exec the real script.
# Usage: tools/tpu_run.sh script.py [out] [script args...]
set -u
SCRIPT="$1"
OUT="${2:-/dev/stdout}"
shift; [ $# -gt 0 ] && shift
for attempt in $(seq 1 12); do
  if timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
(jnp.ones((256, 256)) @ jnp.ones((256, 256))).block_until_ready()
EOF
  then
    REPO="$(cd "$(dirname "$0")/.." && pwd)"
    PYTHONPATH="$REPO:${PYTHONPATH:-}" exec python "$SCRIPT" "$@" > "$OUT" 2>&1
  fi
  echo "[tpu_run] device not responding (attempt $attempt); cooling down" >&2
  sleep 150
done
echo "[tpu_run] giving up: device unavailable" >&2
exit 1
