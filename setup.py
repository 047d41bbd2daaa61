from setuptools import setup, find_packages

setup(
    name="multimodal_decoding_tpu",
    version="0.3.0",
    description="TPU-native framework for decoding visual/semantic content from fMRI",
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
)
