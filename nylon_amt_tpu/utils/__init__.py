"""Utilities: audio IO, logging, profiling."""
