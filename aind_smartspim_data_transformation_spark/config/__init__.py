"""Job configuration plane."""
