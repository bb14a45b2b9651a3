"""Training layer: losses, schedules, hand-rolled Adam, the jitted train step
and the host loop."""
