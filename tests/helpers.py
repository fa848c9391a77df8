import os

import numpy as np

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


def read_reference_data(name):
    """Load a golden fixture from the reference test suite (whitespace-delimited)."""
    return np.loadtxt(os.path.join(DATA_DIR, name))
