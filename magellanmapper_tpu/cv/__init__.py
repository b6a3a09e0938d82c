"""Detection & segmentation domain."""
