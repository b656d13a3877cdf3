"""TPU kernels (Pallas) for the hot compute path."""
