"""Testing doubles shipped with the package so Spark's out-of-process
Python workers can import them (a test-local fake can't cross the
driver/worker process boundary)."""
