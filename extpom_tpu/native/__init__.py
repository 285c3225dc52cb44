"""Native (C++) runtime components: record store, fast interpolation."""
