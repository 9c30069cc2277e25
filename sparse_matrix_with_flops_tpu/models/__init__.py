"""Algorithm drivers (L4): R-MCL Markov clustering."""
