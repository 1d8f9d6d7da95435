"""2D orientation-field estimation from images via a Gabor filter bank.

Parity target: utils/vision.py:5-62 — per-pixel argmax over oriented Gabor
responses (default 180 angles, 31x31 kernels, sigma=2, lambda=3, gamma=0.5)
plus an inverse-variance confidence normalized to [0,1].
"""

import numpy as np


def estimate_orientation_field(image, kernel_size=31, sigma=2, lambda_=3,
                               gamma=0.5, num_angles=180):
    import cv2

    def angdiff(a1, a2):
        return np.pi / 2 - np.abs(np.abs(a1 - a2) - np.pi / 2)

    gray = image
    if image.ndim > 2:
        gray = cv2.cvtColor(image, cv2.COLOR_RGB2GRAY)
    height, width = gray.shape

    orientations = np.linspace(0, np.pi, num_angles)
    kernels = [
        cv2.getGaborKernel((kernel_size, kernel_size), sigma, theta, lambda_,
                           gamma, 0, ktype=cv2.CV_32F)
        for theta in orientations
    ]
    responses = np.stack(
        [np.abs(cv2.filter2D(gray, -1, k)) for k in kernels], axis=2
    )
    max_response = np.argmax(responses, axis=2)
    orientation_field = orientations[max_response]

    ori_rep = np.repeat(orientation_field[:, :, None], num_angles, axis=2)
    ori_mat = np.ones((height, width, num_angles)) * orientations
    diff = angdiff(ori_rep, ori_mat)
    diff = diff * diff * responses
    variance = np.sum(diff, axis=2) / (np.sum(responses, axis=2) + 1e-7)
    has_var = variance != 0
    confidence = np.ones(orientation_field.shape, dtype=np.float32)
    if has_var.any():
        valid = 1.0 / (variance * variance)[has_var]
        confidence[has_var] = valid / np.max(valid)
    return orientation_field, confidence
