import numpy
from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "krakenuniq_tpu.kuniq_native",
            sources=["native/kuniq_native.cpp"],
            include_dirs=[numpy.get_include()],
            extra_compile_args=["-O3", "-std=c++17"],
        )
    ]
)
