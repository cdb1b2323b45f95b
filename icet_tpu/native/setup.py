"""Build the native host runtime: python setup.py build_ext --inplace"""

import numpy as np
from setuptools import Extension, setup

setup(
    name="icet_native",
    ext_modules=[
        Extension(
            "_icet_native",
            sources=["icet_native.c"],
            include_dirs=[np.get_include()],
            extra_compile_args=["-O3", "-pthread", "-Wall"],
            extra_link_args=["-pthread"],
        )
    ],
)
