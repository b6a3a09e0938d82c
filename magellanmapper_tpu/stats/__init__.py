"""Regional quantification & statistics."""
