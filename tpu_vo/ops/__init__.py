# Pallas TPU kernels for the hot ops. Import submodules lazily.
