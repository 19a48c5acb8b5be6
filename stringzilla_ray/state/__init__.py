"""Configs, stage manifests, checkpoint/resume logic."""
