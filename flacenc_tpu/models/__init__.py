"""Encoder pipelines: the batched TPU encoder and the numpy oracle."""
