from .matrix import matrix_pipeline, MatrixResult  # noqa: F401
