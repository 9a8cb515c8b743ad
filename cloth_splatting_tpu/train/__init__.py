"""Training: losses, schedules, density control, train states and loops."""
