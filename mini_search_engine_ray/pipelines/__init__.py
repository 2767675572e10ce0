"""End-to-end pipeline compositions and the driver-facing query surface."""
