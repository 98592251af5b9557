"""Docs layer smoke test: the API doc build (doc/gen_docs.py, the
analog of the reference's sphinx docbuild.sh) must render every package
module with its docstring."""

import os
import subprocess
import sys


def test_docbuild(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "doc", "gen_docs.py")],
        capture_output=True, text=True, env=env, cwd=repo, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert "SKIP" not in out.stderr, out.stderr
    build = os.path.join(repo, "doc", "_build")
    index = open(os.path.join(build, "index.html")).read()
    assert "runlmc_tpu" in index
    # every subpackage appears in the index
    for mod in ["runlmc_tpu.ops.bttb", "runlmc_tpu.lmc.woodbury",
                "runlmc_tpu.models.interpolated_llgp",
                "runlmc_tpu.parallel.launcher"]:
        assert mod.replace(".", "_") + ".html" in index, mod
    page = open(
        os.path.join(build, "runlmc_tpu_lmc_woodbury.html")
    ).read()
    assert "Woodbury" in page and "chol_jittered" in page
