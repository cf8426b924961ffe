"""Pure-Python protobuf-runtime SUBSET (shim) — see _shim_core.py for
scope and provenance. Version string mirrors the runtime the pyspark
generated code was built against (validation is a no-op here)."""

__version__ = "6.33.0-rtba-shim"
