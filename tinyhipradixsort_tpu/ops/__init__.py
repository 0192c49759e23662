"""Sort engine implementations (argsort / counting / Pallas TPU kernels)."""
