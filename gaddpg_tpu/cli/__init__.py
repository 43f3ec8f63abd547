"""Command-line entry points mirroring the reference's
`python -m core.train_online` / `core.train_test_offline` interface
(reference: core/train_online.py:35-59, core/train_test_offline.py:30-55).
"""
