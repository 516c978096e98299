"""Build & load the ACTUAL reference C++ `dsacstar` plugin as a CPU oracle.

The reference plugin (`dsacstar/setup.py:28-38`) is the ground truth for
solver fidelity: `tests/test_reference_plugin_parity.py` and
`tools/plugin_ab.py` feed identical scene-coordinate maps to
`dsacstar.forward_rgb` and `ransac.solve_batch` and compare pose errors.

Build details: CPU-only, against system OpenCV 4 with a one-line patch (the
removed `CvMat`/`cvCalcMatMulDeriv` C API in `dsacstar_util_rgbd.h:221-222`
replaced by `cv::matMulDeriv`). The built module is cached under ~/.cache
so the ~2 min build happens once per machine.
"""
from __future__ import annotations

import os
import shutil
import subprocess
import sys

REFERENCE_DSACSTAR = "/root/reference/dsacstar"
CACHE_DIR = os.path.expanduser("~/.cache/crossloc_tpu/dsacstar_build")

_C_API_OLD = """\tCvMat matA = A, matB = B, c_dABdA=_dABdA.getMat(), c_dABdB=_dABdB.getMat();
\tcvCalcMatMulDeriv(&matA, &matB, _dABdA.needed() ? &c_dABdA : 0, _dABdB.needed() ? &c_dABdB : 0);"""
_C_API_NEW = "\tcv::matMulDeriv(_Amat, _Bmat, _dABdA, _dABdB);  // OpenCV>=4: C API removed"

_SETUP_SYS = """from setuptools import setup
from torch.utils.cpp_extension import CppExtension, BuildExtension

setup(
    name='dsacstar',
    ext_modules=[CppExtension(
        name='dsacstar',
        sources=['dsacstar.cpp', 'thread_rand.cpp'],
        include_dirs=['/usr/include/opencv4'],
        libraries=['opencv_core', 'opencv_calib3d'],
        extra_compile_args=['-fopenmp', '-std=c++17'],
        extra_link_args=['-fopenmp'],
    )],
    cmdclass={'build_ext': BuildExtension})
"""


class PluginUnavailable(RuntimeError):
    pass


def build_plugin() -> None:
    """Stage + patch + build the plugin into CACHE_DIR (idempotent).

    Raises PluginUnavailable when the reference tree, OpenCV headers, or the
    toolchain are missing (callers translate to pytest.skip / CLI error).
    """
    if not os.path.isdir(REFERENCE_DSACSTAR):
        raise PluginUnavailable("reference dsacstar source not available")
    if not os.path.isdir("/usr/include/opencv4"):
        raise PluginUnavailable("OpenCV dev headers not available")
    os.makedirs(os.path.dirname(CACHE_DIR), exist_ok=True)
    if not os.path.isdir(CACHE_DIR):
        shutil.copytree(REFERENCE_DSACSTAR, CACHE_DIR)
        util = os.path.join(CACHE_DIR, "dsacstar_util_rgbd.h")
        src = open(util).read()
        if _C_API_OLD in src:
            open(util, "w").write(src.replace(_C_API_OLD, _C_API_NEW))
        with open(os.path.join(CACHE_DIR, "setup_sys.py"), "w") as f:
            f.write(_SETUP_SYS)
    if not any(f.endswith(".so") for f in os.listdir(CACHE_DIR)):
        proc = subprocess.run(
            [sys.executable, "setup_sys.py", "build_ext", "--inplace"],
            cwd=CACHE_DIR, capture_output=True, text=True, timeout=600,
        )
        if proc.returncode != 0:
            raise PluginUnavailable(f"dsacstar build failed:\n{proc.stderr[-2000:]}")


def load_plugin():
    """Build if needed and import the `dsacstar` module."""
    build_plugin()
    import torch  # noqa: F401  (dsacstar links against torch's libc10)

    sys.path.insert(0, CACHE_DIR)
    try:
        import dsacstar  # noqa: F401
    except ImportError as e:
        raise PluginUnavailable(f"dsacstar import failed: {e}")
    finally:
        sys.path.remove(CACHE_DIR)
    return sys.modules["dsacstar"]
