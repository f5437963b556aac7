"""Sources: deterministic pages/polygons synthesis + format-dispatched readers."""
