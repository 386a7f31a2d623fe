"""Serving subsystem: the compute-node HTTP endpoint."""
