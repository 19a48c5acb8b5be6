"""Readers / writers for the transcript data model."""
