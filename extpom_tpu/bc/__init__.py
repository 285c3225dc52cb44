"""Open lateral boundary conditions."""
