"""Structured Streaming variants of the curation pipeline.

The reference is purely batch (SURVEY.md §1.1: no streams); this
package extends the engine to continuous ingestion — the shape a
10^12-image corpus actually arrives in.
"""
