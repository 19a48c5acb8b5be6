"""Dataset -> Dataset transforms composing the flagship pipelines."""
