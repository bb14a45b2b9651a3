"""Host-side utilities: training visualization, profiling."""
