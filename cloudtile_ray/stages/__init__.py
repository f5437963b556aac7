"""Ray Data stage library: every stage is either a pure function over an
Arrow batch (stateless ``map_batches`` task) or a callable class (actor
pool) per SURVEY.md §7.3."""
