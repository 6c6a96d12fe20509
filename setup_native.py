"""Build the native C extensions in place.

    python setup_native.py build_ext --inplace
"""

from setuptools import Extension, setup

setup(
    name="graphem-rapids-tpu-native",
    ext_modules=[
        Extension(
            "graphem_rapids_tpu.native._fastgraph",
            sources=["graphem_rapids_tpu/native/fastgraph.c"],
            extra_compile_args=["-O3"],
        ),
    ],
    script_args=["build_ext", "--inplace"],
)
