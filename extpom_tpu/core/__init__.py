"""Core: Config, Grid, State, stepper, model driver."""
