"""HEALPix pixel centres (ring scheme), pure numpy (no healpy).

Equivalent of the reference's `HEALPixNodes`
(/root/reference/graphs/src/anemoi/graphs/nodes/builders/from_healpix.py:23).
Implements the standard analytic ring-scheme centre formulas
(Gorski et al. 2005) for 12*nside^2 pixels.
"""

from __future__ import annotations

import numpy as np


def healpix_grid(nside: int) -> np.ndarray:
    """(lat, lon) radians of all 12*nside^2 HEALPix pixel centres (ring order)."""
    npix = 12 * nside * nside
    p = np.arange(npix, dtype=np.int64)
    z = np.empty(npix, dtype=np.float64)
    phi = np.empty(npix, dtype=np.float64)

    ncap = 2 * nside * (nside - 1)  # pixels in the north polar cap

    # North polar cap ---------------------------------------------------
    cap = p < ncap
    ph = (p[cap] + 1) / 2.0
    i = np.floor(np.sqrt(ph - np.sqrt(np.floor(ph)))).astype(np.int64) + 1
    j = p[cap] + 1 - 2 * i * (i - 1)
    z[cap] = 1.0 - (i * i) / (3.0 * nside * nside)
    phi[cap] = (np.pi / (2.0 * i)) * (j - 0.5)

    # Equatorial belt ---------------------------------------------------
    belt = (p >= ncap) & (p < npix - ncap)
    pb = p[belt] - ncap
    i = pb // (4 * nside) + nside
    j = pb % (4 * nside) + 1
    s = (i - nside + 1) % 2  # phase shift of alternating rings
    z[belt] = 4.0 / 3.0 - 2.0 * i / (3.0 * nside)
    phi[belt] = (np.pi / (2.0 * nside)) * (j - s / 2.0)

    # South polar cap (mirror of north) --------------------------------
    south = p >= npix - ncap
    ps = npix - 1 - p[south]
    ph = (ps + 1) / 2.0
    i = np.floor(np.sqrt(ph - np.sqrt(np.floor(ph)))).astype(np.int64) + 1
    j = ps + 1 - 2 * i * (i - 1)
    z[south] = -(1.0 - (i * i) / (3.0 * nside * nside))
    # mirror longitudes so ring order stays west->east
    phi[south] = 2.0 * np.pi - (np.pi / (2.0 * i)) * (j - 0.5)

    lat = np.arcsin(np.clip(z, -1.0, 1.0))
    lon = np.mod(phi, 2.0 * np.pi)
    lon = np.where(lon > np.pi, lon - 2.0 * np.pi, lon)
    return np.stack([lat, lon], axis=-1)
