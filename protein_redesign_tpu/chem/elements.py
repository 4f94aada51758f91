"""Periodic-table data used by the dependency-free molecule layer."""

# fmt: off
ELEMENTS = [
    "H", "He", "Li", "Be", "B", "C", "N", "O", "F", "Ne",
    "Na", "Mg", "Al", "Si", "P", "S", "Cl", "Ar", "K", "Ca",
    "Sc", "Ti", "V", "Cr", "Mn", "Fe", "Co", "Ni", "Cu", "Zn",
    "Ga", "Ge", "As", "Se", "Br", "Kr", "Rb", "Sr", "Y", "Zr",
    "Nb", "Mo", "Tc", "Ru", "Rh", "Pd", "Ag", "Cd", "In", "Sn",
    "Sb", "Te", "I", "Xe", "Cs", "Ba", "La", "Ce", "Pr", "Nd",
    "Pm", "Sm", "Eu", "Gd", "Tb", "Dy", "Ho", "Er", "Tm", "Yb",
    "Lu", "Hf", "Ta", "W", "Re", "Os", "Ir", "Pt", "Au", "Hg",
    "Tl", "Pb", "Bi", "Po", "At", "Rn", "Fr", "Ra", "Ac", "Th",
    "Pa", "U", "Np", "Pu", "Am", "Cm", "Bk", "Cf", "Es", "Fm",
    "Md", "No", "Lr", "Rf", "Db", "Sg", "Bh", "Hs", "Mt", "Ds",
    "Rg", "Cn", "Nh", "Fl", "Mc", "Lv", "Ts", "Og",
]
# fmt: on

ATOMIC_NUM = {symbol: i + 1 for i, symbol in enumerate(ELEMENTS)}
# MOL2 / PDB files sometimes use upper-cased symbols ("CL", "BR").
ATOMIC_NUM.update({symbol.upper(): i + 1 for i, symbol in enumerate(ELEMENTS)})


def symbol_of(atomic_num: int) -> str:
    if atomic_num == 0:
        return "*"  # wildcard/dummy atom
    return ELEMENTS[atomic_num - 1]


# Default valences used for implicit-hydrogen assignment, following common
# organic-chemistry conventions (multiple entries = allowed valence states,
# smallest compatible one wins).
DEFAULT_VALENCES = {
    1: (1,),            # H
    5: (3,),            # B
    6: (4,),            # C
    7: (3,),            # N
    8: (2,),            # O
    9: (1,),            # F
    14: (4,),           # Si
    15: (3, 5),         # P
    16: (2, 4, 6),      # S
    17: (1,),           # Cl
    34: (2, 4, 6),      # Se
    35: (1,),           # Br
    53: (1,),           # I
}

# Elements that participate in our (heuristic) aromaticity perception.
AROMATIC_CANDIDATES = {5, 6, 7, 8, 15, 16, 33, 34}

# Valence-shell electron counts (periodic-table group), used by the
# conjugation perception's available pi/lone-pair electron count.
N_OUTER_ELECS = {
    1: 1,               # H
    5: 3,               # B
    6: 4,               # C
    7: 5,               # N
    8: 6,               # O
    9: 7,               # F
    14: 4,              # Si
    15: 5,              # P
    16: 6,              # S
    17: 7,              # Cl
    34: 6,              # Se
    35: 7,              # Br
    53: 7,              # I
}
