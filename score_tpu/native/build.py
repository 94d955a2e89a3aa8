"""Build the native assembly extension in-place:

    python -m score_tpu.native.build

Produces score_tpu/native/_fastbuild*.so; assembly/conic.py picks it up
automatically (pure-Python fallback otherwise).
"""

import os
import subprocess
import sys
import sysconfig

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def build() -> str:
    src = os.path.join(HERE, "fastbuild.cpp")
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    out = os.path.join(HERE, "_fastbuild" + suffix)
    include_py = sysconfig.get_path("include")
    include_np = np.get_include()
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-fPIC", "-shared", "-std=c++17",
        f"-I{include_py}", f"-I{include_np}",
        src, "-o", out,
    ]
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.path.insert(0, HERE)
    import _fastbuild  # noqa: F401

    print("import ok:", _fastbuild.assemble_pose_rows_2d.__doc__.split(":")[0])
