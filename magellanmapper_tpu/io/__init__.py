"""Host-side I/O and storage."""
