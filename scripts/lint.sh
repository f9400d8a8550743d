#!/bin/bash
# Offline lint gate (the reference runs black/isort/flake8/mypy in CI;
# this environment has none of those installed, so we gate on what's here).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== compile check =="
python - <<'EOF'
import pathlib, sys
bad = []
for f in list(pathlib.Path("eilev_tpu").rglob("*.py")) + list(
    pathlib.Path("scripts").rglob("*.py")
) + list(pathlib.Path("tests").rglob("*.py")) + [
    pathlib.Path("bench.py"), pathlib.Path("__graft_entry__.py")
]:
    try:
        compile(f.read_text(), str(f), "exec")
    except SyntaxError as e:
        bad.append(f"{f}: {e}")
for b in bad:
    print(b)
sys.exit(1 if bad else 0)
EOF

echo "== import check =="
JAX_PLATFORMS=cpu python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import eilev_tpu
import eilev_tpu.data
import eilev_tpu.eval
import eilev_tpu.generation
import eilev_tpu.models
import eilev_tpu.native
import eilev_tpu.ops
import eilev_tpu.parallel
import eilev_tpu.training
import eilev_tpu.utils
print("imports OK")
EOF

echo "== mypy =="
if command -v mypy >/dev/null 2>&1; then
    mypy eilev_tpu scripts bench.py
else
    # this sandbox has no mypy and no network; CI installs and runs it
    echo "mypy not installed; skipped (runs in CI via .github/workflows/test.yaml)"
fi

echo "== isort =="
if command -v isort >/dev/null 2>&1; then
    isort --check-only --profile black eilev_tpu
else
    echo "isort not installed; skipped (runs in CI)"
fi

echo "== pyupgrade =="
if command -v pyupgrade >/dev/null 2>&1; then
    git ls-files 'eilev_tpu/**/*.py' | xargs pyupgrade --py310-plus
else
    echo "pyupgrade not installed; skipped (runs in CI)"
fi

echo "OK"
