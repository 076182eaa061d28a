"""Type aliases shared across the framework (reference: dtype_aliases.py:23-42)."""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Tuple

import numpy as np

# 2-D image array
Image = np.ndarray

# 2x3 transformation matrix
TMat = np.ndarray

# (n_keypoints, n_features) descriptor array
Descriptors = np.ndarray

# (H, W, 2) optical flow field
Flow = np.ndarray

Shape2D = Tuple[int, int]

# padding (left, right, top, bottom)
Padding = Tuple[int, int, int, int]

XML = ET.Element
