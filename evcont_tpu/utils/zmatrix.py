"""Z-matrix (internal coordinates) to cartesian conversion.

The reference builds the Zundel ground-state geometry from literature
internal coordinates through pyscf's Z-matrix parser
(scripts/MD/Zundel_thermodynamics/construct_geometry.py). This is the
standard NERF placement: each atom is positioned by a bond length to A, a
bond angle with B, and a dihedral with C.
"""

import numpy as np


def _unit(v):
    return v / np.linalg.norm(v)


def zmatrix_to_cartesian(entries):
    """Convert Z-matrix entries to cartesian coordinates.

    Args:
        entries: list of tuples, one per atom (indices are 0-based refs to
            previous atoms; angles in degrees):
              ()                                — first atom at origin
              (a, r)                            — bond
              (a, r, b, theta)                  — bond + angle
              (a, r, b, theta, c, phi)          — bond + angle + dihedral

    Returns:
        (natm, 3) coordinates in the same length unit as r.
    """
    coords = []
    for i, e in enumerate(entries):
        if len(e) == 0:
            coords.append(np.zeros(3))
        elif len(e) == 2:
            a, r = e
            coords.append(coords[a] + np.array([0.0, 0.0, r]))
        elif len(e) == 4:
            a, r, b, theta = e
            theta = np.deg2rad(theta)
            ba = _unit(coords[a] - coords[b])
            # any vector perpendicular to ba
            ref = np.array([1.0, 0.0, 0.0])
            if abs(ba @ ref) > 0.9:
                ref = np.array([0.0, 1.0, 0.0])
            perp = _unit(np.cross(ba, ref))
            d = -np.cos(theta) * ba + np.sin(theta) * np.cross(perp, ba)
            coords.append(coords[a] + r * d)
        elif len(e) == 6:
            a, r, b, theta, c, phi = e
            theta, phi = np.deg2rad(theta), np.deg2rad(phi)
            A, B, C = coords[a], coords[b], coords[c]
            b1 = _unit(A - B)
            n = _unit(np.cross(B - C, b1))
            m = np.cross(n, b1)
            d = (-np.cos(theta) * b1
                 + np.sin(theta) * (np.cos(phi) * m + np.sin(phi) * n))
            coords.append(A + r * d)
        else:
            raise ValueError(f"bad z-matrix entry {e!r}")
    return np.array(coords)


def zundel_geometry():
    """Zundel cation (H5O2+) ground-state geometry from the literature
    internal coordinates used by the reference
    (construct_geometry.py: r(O-H+) = 1.1950 A, O-H+-O = 173.730 deg,
    r(OH) = 0.9686/0.9682, angles 115.849/118.158, dihedrals
    295.302/163.635), in Angstrom, atom order (O, H+, H, H, O, H, H)
    matching workloads/common.zundel."""
    entries = [
        (),                                    # 0: H+ (bridging proton)
        (0, 1.1950),                           # 1: O1
        (0, 1.1950, 1, 173.730),               # 2: O2
        (1, 0.9686, 0, 115.849, 2, 295.302),   # 3: H1 on O1
        (1, 0.9682, 0, 118.158, 2, 163.635),   # 4: H2 on O1
        (2, 0.9686, 0, 115.849, 1, 295.302),   # 5: H3 on O2
        (2, 0.9682, 0, 118.158, 1, 163.635),   # 6: H4 on O2
    ]
    xyz = zmatrix_to_cartesian(entries)
    # reorder to (O, H, H, H, O, H, H): O1, H1, H2, H+, O2, H3, H4
    order = [1, 3, 4, 0, 2, 5, 6]
    return xyz[order]
