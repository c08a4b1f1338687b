"""Built-in Gaussian basis-set tables.

The reference relies on pyscf's basis library (e.g. "sto-6g" in
scripts/PES_H_chain/H6_PES/H6_continuation.py:31, "6-31G" in
scripts/MD/Zundel_thermodynamics/continuation/04_Zundel_continuation_MD.py:48).
pyscf is not available in this environment, so the standard published
exponents/contraction coefficients for the elements exercised by the
reference workloads (H chains, H2O, Zundel cation) are embedded here.

Format: BASIS_SETS[basis_name][element_symbol] = list of shells, each shell a
tuple (l, exponents, coefficients) where coefficients multiply *normalized*
primitive Gaussians. Contracted functions are renormalized at build time
(matching pyscf's mole normalization) in integrals/shells.py.
"""

# Universal STO-3G contraction coefficients (Hehre, Stewart, Pople 1969)
_STO3G_1S_C = [0.15432897, 0.53532814, 0.44463454]
_STO3G_2S_C = [-0.09996723, 0.39951283, 0.70011547]
_STO3G_2P_C = [0.15591627, 0.60768372, 0.39195739]

# STO-6G universal expansion of a zeta=1 Slater 1s, exps scaled by zeta^2
_STO6G_1S_E = [23.10303149, 4.235915534, 1.185056519,
               0.407098898, 0.158088415, 0.065110361]
_STO6G_1S_C = [0.009163596281, 0.04936149294, 0.1685383049,
               0.3705627997, 0.4164915298, 0.1303340841]

# STO-6G universal zeta=1 2s/2p expansion (shared exponents), re-derived in
# this repo by the same overlap-maximizing least-squares fit the STO-NG
# papers use (Hehre, Stewart, Pople 1969): fit a zeta=1 Slater 2s and 2p to
# six Gaussians with common exponents, coefficients solved exactly per
# exponent set. The identical procedure reproduces the published STO-3G
# 1s/2sp tables and the STO-6G 1s row above to <=1e-5, validating these.
_STO6G_2SP_E = [10.30873913, 2.040366606, 0.6341439136,
                0.2439779874, 0.1059597595, 0.04856909431]
_STO6G_2S_C = [-0.01325272674, -0.04699160236, -0.03378569614,
               0.2502405863, 0.5951172883, 0.2407074853]
_STO6G_2P_C = [0.003759666589, 0.03767919938, 0.1738961141,
               0.4180358089, 0.4258603406, 0.1017089285]


def _scale(exps, zeta):
    return [e * zeta * zeta for e in exps]


BASIS_SETS = {
    "sto-3g": {
        "H": [
            (0, [3.42525091, 0.62391373, 0.16885540], _STO3G_1S_C),
        ],
        "C": [
            (0, [71.6168370, 13.0450960, 3.5305122], _STO3G_1S_C),
            (0, [2.9412494, 0.6834831, 0.2222899], _STO3G_2S_C),
            (1, [2.9412494, 0.6834831, 0.2222899], _STO3G_2P_C),
        ],
        "N": [
            (0, [99.1061690, 18.0523120, 4.8856602], _STO3G_1S_C),
            (0, [3.7804559, 0.8784966, 0.2857144], _STO3G_2S_C),
            (1, [3.7804559, 0.8784966, 0.2857144], _STO3G_2P_C),
        ],
        "O": [
            (0, [130.7093200, 23.8088610, 6.4436083], _STO3G_1S_C),
            (0, [5.0331513, 1.1695961, 0.3803890], _STO3G_2S_C),
            (1, [5.0331513, 1.1695961, 0.3803890], _STO3G_2P_C),
        ],
    },
    "sto-6g": {
        # Standard molecular Slater exponents (same zetas as the STO-3G
        # rows above: 1s/2sp = C 5.67/1.72, N 6.67/1.95, O 7.66/2.25).
        "C": [
            (0, _scale(_STO6G_1S_E, 5.67), _STO6G_1S_C),
            (0, _scale(_STO6G_2SP_E, 1.72), _STO6G_2S_C),
            (1, _scale(_STO6G_2SP_E, 1.72), _STO6G_2P_C),
        ],
        "N": [
            (0, _scale(_STO6G_1S_E, 6.67), _STO6G_1S_C),
            (0, _scale(_STO6G_2SP_E, 1.95), _STO6G_2S_C),
            (1, _scale(_STO6G_2SP_E, 1.95), _STO6G_2P_C),
        ],
        "O": [
            (0, _scale(_STO6G_1S_E, 7.66), _STO6G_1S_C),
            (0, _scale(_STO6G_2SP_E, 2.25), _STO6G_2S_C),
            (1, _scale(_STO6G_2SP_E, 2.25), _STO6G_2P_C),
        ],
        # H uses the standard scale factor zeta = 1.24
        "H": [
            (0, _scale(_STO6G_1S_E, 1.24), _STO6G_1S_C),
        ],
    },
    "6-31g": {
        "H": [
            (0, [18.7311370, 2.8253937, 0.6401217],
                [0.03349460, 0.23472695, 0.81375733]),
            (0, [0.1612778], [1.0]),
        ],
        "C": [
            (0, [3047.5249, 457.36951, 103.94869, 29.210155, 9.2866630, 3.1639270],
                [0.0018347, 0.0140373, 0.0688426, 0.2321844, 0.4679413, 0.3623120]),
            (0, [7.8682724, 1.8812885, 0.5442493],
                [-0.1193324, -0.1608542, 1.1434564]),
            (1, [7.8682724, 1.8812885, 0.5442493],
                [0.0689991, 0.3164240, 0.7443083]),
            (0, [0.1687144], [1.0]),
            (1, [0.1687144], [1.0]),
        ],
        "N": [
            (0, [4173.5110, 627.45790, 142.90210, 40.234330, 12.820210, 4.3904370],
                [0.0018348, 0.0139950, 0.0685870, 0.2322410, 0.4690700, 0.3604550]),
            (0, [11.626358, 2.7162800, 0.7722180],
                [-0.1149610, -0.1691180, 1.1458520]),
            (1, [11.626358, 2.7162800, 0.7722180],
                [0.0675800, 0.3239070, 0.7408950]),
            (0, [0.2120313], [1.0]),
            (1, [0.2120313], [1.0]),
        ],
        "O": [
            (0, [5484.6717, 825.23495, 188.04696, 52.964500, 16.897570, 5.7996353],
                [0.0018311, 0.0139501, 0.0684451, 0.2327143, 0.4701930, 0.3585209]),
            (0, [15.539616, 3.5999336, 1.0137618],
                [-0.1107775, -0.1480263, 1.1307670]),
            (1, [15.539616, 3.5999336, 1.0137618],
                [0.0708743, 0.3397528, 0.7271586]),
            (0, [0.2700058], [1.0]),
            (1, [0.2700058], [1.0]),
        ],
    },
}

BASIS_SETS["cc-pvdz"] = {
    # Dunning correlation-consistent double-zeta (spherical d on O)
    "H": [
        (0, [13.0100, 1.9620, 0.4446, 0.1220],
            [0.0196850, 0.1379770, 0.4781480, 0.5012400]),
        (0, [0.1220], [1.0]),
        (1, [0.7270], [1.0]),
    ],
    "O": [
        (0, [11720.0, 1759.0, 400.8, 113.7, 37.03, 13.27, 5.025, 1.013,
             0.3023],
            [0.000710, 0.005470, 0.027837, 0.104800, 0.283062, 0.448719,
             0.270952, 0.015458, -0.002585]),
        (0, [11720.0, 1759.0, 400.8, 113.7, 37.03, 13.27, 5.025, 1.013,
             0.3023],
            [-0.000160, -0.001263, -0.006267, -0.025716, -0.070924,
             -0.165411, -0.116955, 0.557368, 0.572759]),
        (0, [0.3023], [1.0]),
        (1, [17.70, 3.854, 1.046],
            [0.043018, 0.228913, 0.508728]),
        (1, [0.2753], [1.0]),
        (2, [1.185], [1.0]),
    ],
}

BASIS_SETS["cc-pvtz"] = {
    # Dunning correlation-consistent triple-zeta (Dunning, JCP 90, 1007
    # (1989)): H (5s2p1d)/[3s2p1d], O (10s5p2d1f)/[4s3p2d1f]; spherical
    # d/f components. Needed by the reference's vtz H2O workloads
    # (scripts/MD/H2O/md_H2O_vtz_CAS_continuation.py:20-21). Anchored in
    # tests/test_integrals.py against the literature H2O RHF energy and
    # against a fully uncontracted-primitive variational bound.
    "H": [
        (0, [33.8700, 5.0950, 1.1590],
            [0.0060680, 0.0453080, 0.2028220]),
        (0, [0.3258], [1.0]),
        (0, [0.1027], [1.0]),
        (1, [1.4070], [1.0]),
        (1, [0.3880], [1.0]),
        (2, [1.0570], [1.0]),
    ],
    "O": [
        (0, [15330.0, 2299.0, 522.4, 147.3, 47.55, 16.76, 6.207, 0.6882],
            [0.0005080, 0.0039290, 0.0202430, 0.0791810, 0.2306870,
             0.4331180, 0.3502600, -0.0081540]),
        (0, [15330.0, 2299.0, 522.4, 147.3, 47.55, 16.76, 6.207, 0.6882],
            [-0.0001150, -0.0008950, -0.0046360, -0.0187240, -0.0584630,
             -0.1364630, -0.1757400, 0.6034180]),
        (0, [1.7520], [1.0]),
        (0, [0.2384], [1.0]),
        (1, [34.46, 7.749, 2.280],
            [0.0159280, 0.0997400, 0.3104920]),
        (1, [0.7156], [1.0]),
        (1, [0.2140], [1.0]),
        (2, [2.314], [1.0]),
        (2, [0.645], [1.0]),
        (3, [1.428], [1.0]),
    ],
}

# Aliases accepting pyscf-style capitalization
_ALIASES = {"sto6g": "sto-6g", "sto3g": "sto-3g", "631g": "6-31g",
            "ccpvdz": "cc-pvdz", "ccpvtz": "cc-pvtz"}


def get_element_basis(basis_name, symbol):
    """Look up the shell list for an element; raises with a clear message if
    the basis/element is not embedded yet."""
    key = basis_name.lower().replace(" ", "")
    key = _ALIASES.get(key.replace("-", ""), key)
    try:
        table = BASIS_SETS[key]
    except KeyError:
        raise KeyError(
            f"Basis set '{basis_name}' not embedded. Available: "
            f"{sorted(BASIS_SETS)}"
        )
    try:
        return table[symbol]
    except KeyError:
        raise KeyError(
            f"Element '{symbol}' not available in embedded basis "
            f"'{basis_name}' (have {sorted(table)})"
        )
