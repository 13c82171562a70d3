"""Pure-Python reference implementations for the parity test-suite.

These re-state the semantics of /root/reference (ddxv/adscrawler) as
small, per-row, single-threaded Python — the *oracle* the Spark engine
is tested against.  Nothing in here runs on the Spark hot path.
"""
