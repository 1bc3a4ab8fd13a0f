from setuptools import find_packages, setup

setup(
    name="gaussianprocessnode_tpu",
    version="0.1.0",
    description="TPU-native variational sparse Gaussian process factor-graph framework",
    packages=find_packages(exclude=("tests", "experiments", "benchmarks")),
    python_requires=">=3.10",
)
