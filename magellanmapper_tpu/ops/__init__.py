"""TPU-native image operators (JAX/XLA/Pallas)."""
