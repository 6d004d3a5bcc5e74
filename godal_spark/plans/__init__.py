"""Physical-planning helpers: skew salting, checkpoint lineage, layout."""
