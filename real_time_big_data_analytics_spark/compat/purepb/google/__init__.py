# namespace root of the pure-Python protobuf shim (see
# protobuf/_shim_core.py). Only ever importable when the REAL
# google.protobuf is absent — the activation helper refuses otherwise.
