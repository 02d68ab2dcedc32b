from setuptools import find_packages, setup

setup(
    name='dpvo_tpu',
    version='0.1.0',
    description='TPU-native deep patch visual odometry / SLAM (JAX/XLA/Pallas)',
    packages=find_packages(include=['dpvo_tpu', 'dpvo_tpu.*']),
    python_requires='>=3.10',
    install_requires=[
        'jax', 'numpy', 'pyyaml', 'opencv-python', 'matplotlib',
    ],
    extras_require={
        'train': ['optax'],
        'dev': ['pytest'],
    },
)
