from setuptools import find_packages, setup

setup(
    name="youtokentome_tpu",
    version="0.1.0",
    description="TPU-native unsupervised text tokenizer: fast Byte Pair Encoding on JAX/XLA",
    packages=find_packages(include=["youtokentome_tpu", "youtokentome_tpu.*"]),
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "click>=4.0"],
    entry_points={
        "console_scripts": ["yttm-tpu = youtokentome_tpu.cli:main"],
    },
)
