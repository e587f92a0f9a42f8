"""Training: optimizer schedules, EMA, train/eval steps, checkpointing."""
