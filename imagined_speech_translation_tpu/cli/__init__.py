"""Command-line entry points (reference: ``main_model/scripts/train.py``)."""
