"""Training: jitted step, loop, plateau LR schedule, checkpointing."""
