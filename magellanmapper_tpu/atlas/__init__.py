"""Atlas registration & curation (JAX registration engine, no Elastix)."""
