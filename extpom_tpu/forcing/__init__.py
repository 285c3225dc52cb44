"""Host-side forcing providers (double-buffered time interpolation)."""
