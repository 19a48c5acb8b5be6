"""Flagship pipeline compositions."""
