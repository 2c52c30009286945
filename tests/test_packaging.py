"""Packaging guards (VERDICT r4 weak #4): a clean `pip install .` must
yield a package whose unconditional imports all resolve.

Two layers:
- a fast static check that every third-party module imported at module
  scope anywhere in the package is declared in pyproject dependencies
  (the round-4 failure mode: optax/orbax imported but undeclared);
- a slow venv rehearsal that builds and installs the wheel (--no-deps,
  system site-packages provide the declared deps offline) and imports
  the train/checkpoint stack from outside the repo tree.
"""
import ast
import os
import subprocess
import sys
import sysconfig
import tomllib
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "kotoba_whisper_tpu"

# import-name -> pip distribution name where they differ
_DIST_NAME = {"orbax": "orbax-checkpoint"}

# lazy-only imports (inside functions, guarded): allowed to be extras
_STDLIB = set(sys.stdlib_module_names)


def _module_scope_imports(path: Path) -> set[str]:
    """Top-level (module-scope) imports only — what `import pkg` pulls in
    unconditionally. Imports inside functions/try blocks don't count."""
    tree = ast.parse(path.read_text())
    out: set[str] = set()
    for node in tree.body:  # module scope only, not ast.walk
        if isinstance(node, ast.Import):
            out.update(a.name.split(".")[0] for a in node.names)
        elif isinstance(node, ast.ImportFrom) and node.level == 0:
            if node.module:
                out.add(node.module.split(".")[0])
    return out


def test_unconditional_imports_declared():
    deps = tomllib.loads((REPO / "pyproject.toml").read_text())
    declared = {
        d.split("[")[0].split(">")[0].split("=")[0].strip()
        for d in deps["project"]["dependencies"]
    }
    missing = {}
    for py in PKG.rglob("*.py"):
        for mod in _module_scope_imports(py):
            if mod in _STDLIB or mod == "kotoba_whisper_tpu":
                continue
            dist = _DIST_NAME.get(mod, mod)
            if dist not in declared:
                missing.setdefault(mod, []).append(
                    str(py.relative_to(REPO))
                )
    assert not missing, (
        f"module-scope imports not declared in pyproject dependencies: "
        f"{missing}"
    )


@pytest.mark.slow
def test_pip_install_smoke(tmp_path):
    """Build the wheel with the dev interpreter (offline), install it
    into a fresh venv, and import the train stack from a neutral cwd —
    proves the wheel ships every subpackage. The declared deps are
    supplied to the probe venv via PYTHONPATH (this box is offline; the
    dev env's site-packages stand in for a real `pip install`'s
    dependency resolution, which test_unconditional_imports_declared
    guards)."""
    env = {**os.environ, "PIP_NO_INPUT": "1"}
    r = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--no-deps",
         "--no-build-isolation", "--no-index", "-w", str(tmp_path),
         str(REPO)],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    wheels = list(tmp_path.glob("kotoba_whisper_tpu-*.whl"))
    assert len(wheels) == 1, wheels
    venv = tmp_path / "venv"
    subprocess.run(
        [sys.executable, "-m", "venv", str(venv)],
        check=True, capture_output=True,
    )
    vpy = venv / "bin" / "python"
    r = subprocess.run(
        [str(vpy), "-m", "pip", "install", "--no-deps", "--no-index",
         str(wheels[0])],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    dev_site = sysconfig.get_paths()["purelib"]
    r = subprocess.run(
        [str(vpy), "-c",
         "import kotoba_whisper_tpu.train.distill, "
         "kotoba_whisper_tpu.train.checkpoint, "
         "kotoba_whisper_tpu.decode.greedy, "
         "kotoba_whisper_tpu.eval.metrics, "
         "kotoba_whisper_tpu.cli.distill; print('ok')"],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={**env, "JAX_PLATFORMS": "cpu", "PYTHONPATH": dev_site},
        timeout=180,
    )
    assert r.returncode == 0 and "ok" in r.stdout, r.stderr[-2000:]
