"""Import-satisfying stub for ``pytorch_metric_learning`` (not installed).

Only `trainer/losses.py:19` needs the import to succeed; NTXentLoss is
constructed solely inside the contrastive branches, which the measured
baseline configs never take.
"""
