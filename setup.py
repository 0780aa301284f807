"""Package build: pure-Python package + the native FLAC decoder
(csrc/flacdec.cc -> cpc2_tpu/ops/libflacdec.so, loaded via ctypes).

The reference's setup.py builds its one native component (the Cython DTW
kernel); ours builds the C++ audio decoder — the DTW kernel here is a Pallas
TPU kernel and needs no host build step.
"""

import subprocess
from pathlib import Path

from setuptools import setup, find_packages
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        root = Path(__file__).parent
        out = root / "cpc2_tpu" / "ops" / "libflacdec.so"
        src = root / "csrc" / "flacdec.cc"
        if src.exists():
            print(f"building {out} from {src}")
            subprocess.check_call(
                ["g++", "-O3", "-fPIC", "-std=c++17", "-shared",
                 "-o", str(out), str(src)])
        super().run()


setup(
    name="cpc2_tpu",
    version="0.1.0",
    description="TPU-native Contrastive Predictive Coding on raw audio "
                "(JAX/XLA/Pallas), feature-complete with MarvinLvn/CPC2",
    packages=find_packages(include=["cpc2_tpu", "cpc2_tpu.*"]),
    package_data={"cpc2_tpu.ops": ["libflacdec.so"],
                  "cpc2_tpu.utils": ["small_grid.json"]},
    python_requires=">=3.10",
    install_requires=["jax", "flax", "optax", "numpy", "scipy"],
    extras_require={"interop": ["torch"], "research": ["scikit-learn"],
                    "data": ["pandas"]},
    cmdclass={"build_py": BuildWithNative},
    entry_points={
        "console_scripts": [
            "cpc2-train=cpc2_tpu.train:cli",
        ],
    },
)
