"""Serving layer for the curation/ANN operator library — the
pipeline-operations counterpart of `photo/serve.py`."""
