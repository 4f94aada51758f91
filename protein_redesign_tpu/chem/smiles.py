"""A compact SMILES parser producing ``Molecule`` graphs.

Supports the constructs needed for drug-like ligands (the reference feeds
SMILES through ``Chem.MolFromSmiles`` at `generate.py:122` and
`scripts/predict_batch_strc_msk_inp.py:121-126`):

- organic-subset atoms (B C N O P S F Cl Br I) and aromatic lowercase forms
- bracket atoms ``[13CH2+2]`` with isotope, chirality (@/@@), H-count, charge
- bonds ``- = # : / \\``, branches ``( )``, ring closures ``1..9`` and ``%nn``
- dots (disconnected fragments stay in one graph, e.g. salts)
- the wildcard ``*`` / ``[*]`` (atomic number 0, as RDKit parses the
  reference's dummy-ligand token)

Directional bonds ``/`` and ``\\`` are recorded on the Bond and resolved
to STEREOE/STEREOZ on the flanked double bond during perception
(`mol.Molecule._perceive_double_bond_stereo`) — the stereo category the
featurizer vocabulary reads.
"""

from __future__ import annotations

from typing import List, Optional

from .elements import ATOMIC_NUM
from .mol import Atom, Bond, Molecule

_ORGANIC_TWO = ("Cl", "Br")
_ORGANIC_ONE = set("BCNOPSFI")
_AROMATIC_ORGANIC = set("bcnops")

_BOND_ORDERS = {"-": 1, "=": 2, "#": 3, ":": 4, "/": 1, "\\": 1}


class SmilesError(ValueError):
    pass


def strip_cxsmiles(line: str) -> str:
    """Drop a CXSMILES extension block (` |...|`), as found in the
    reference's `scripts/test_pdb.smiles` coordinate annotations."""
    idx = line.find(" |")
    return line[:idx] if idx >= 0 else line


def parse_smiles(smiles: str) -> Molecule:
    smiles = strip_cxsmiles(smiles.strip())
    atoms: List[Atom] = []
    bonds: List[Bond] = []
    # Stack of (atom_index) for branch handling.
    stack: List[int] = []
    prev: Optional[int] = None
    pending_bond: Optional[str] = None
    ring_openings: dict = {}

    i = 0
    n = len(smiles)

    def add_atom(atom: Atom) -> int:
        atoms.append(atom)
        return len(atoms) - 1

    def close_bond(a1: int, a2: int, bond_char: Optional[str],
                   both_aromatic: bool) -> None:
        if bond_char is None:
            if both_aromatic:
                order, aromatic = 4, True
            else:
                order, aromatic = 1, False
        else:
            order = _BOND_ORDERS[bond_char]
            aromatic = order == 4
        direction = {"/": 1, "\\": -1}.get(bond_char, 0)
        bonds.append(Bond(a1, a2, order=order, is_aromatic=aromatic,
                          direction=direction))

    while i < n:
        c = smiles[i]
        if c == "(":
            if prev is None:
                raise SmilesError("Branch with no preceding atom.")
            stack.append(prev)
            i += 1
        elif c == ")":
            if not stack:
                raise SmilesError("Unbalanced ')'.")
            prev = stack.pop()
            i += 1
        elif c == ".":
            prev = None
            pending_bond = None
            i += 1
        elif c in _BOND_ORDERS:
            pending_bond = c
            i += 1
        elif c.isdigit() or c == "%":
            if c == "%":
                if i + 2 >= n or not smiles[i + 1: i + 3].isdigit():
                    raise SmilesError("Bad %nn ring closure.")
                num = int(smiles[i + 1: i + 3])
                i += 3
            else:
                num = int(c)
                i += 1
            if prev is None:
                raise SmilesError("Ring closure with no preceding atom.")
            if num in ring_openings:
                other, obond = ring_openings.pop(num)
                bond_char = pending_bond or obond
                close_bond(
                    other, prev, bond_char,
                    atoms[other].is_aromatic and atoms[prev].is_aromatic,
                )
            else:
                ring_openings[num] = (prev, pending_bond)
            pending_bond = None
        elif c == "[":
            j = smiles.index("]", i)
            atom = _parse_bracket_atom(smiles[i + 1: j])
            idx = add_atom(atom)
            if prev is not None:
                close_bond(prev, idx, pending_bond,
                           atoms[prev].is_aromatic and atom.is_aromatic)
            prev = idx
            pending_bond = None
            i = j + 1
        else:
            # Organic-subset atom.
            symbol = None
            if smiles[i:i + 2] in _ORGANIC_TWO:
                symbol = smiles[i:i + 2]
                aromatic = False
                i += 2
            elif c in _ORGANIC_ONE:
                symbol = c
                aromatic = False
                i += 1
            elif c in _AROMATIC_ORGANIC:
                symbol = c.upper()
                aromatic = True
                i += 1
            elif c == "*":
                # Wildcard dummy atom (atomic number 0), as RDKit parses
                # the reference's "*" dummy ligand (`generate.py:122-123`):
                # featurizes to the "misc" atomic-num class.
                idx = add_atom(Atom(0))
                if prev is not None:
                    close_bond(prev, idx, pending_bond, False)
                prev = idx
                pending_bond = None
                i += 1
                continue
            else:
                raise SmilesError(f"Unexpected character {c!r} at {i}.")
            atom = Atom(ATOMIC_NUM[symbol], is_aromatic=aromatic)
            idx = add_atom(atom)
            if prev is not None:
                close_bond(prev, idx, pending_bond,
                           atoms[prev].is_aromatic and aromatic)
            prev = idx
            pending_bond = None

    if ring_openings:
        raise SmilesError(f"Unclosed ring bonds: {sorted(ring_openings)}.")
    if stack:
        raise SmilesError("Unbalanced '('.")
    return Molecule(atoms, bonds)


def _parse_bracket_atom(body: str) -> Atom:
    i = 0
    n = len(body)
    # isotope
    while i < n and body[i].isdigit():
        i += 1
    # element symbol (possibly aromatic lowercase)
    aromatic = False
    if i < n and body[i].islower() and body[i] in "bcnopsa":
        # aromatic one-letter (as, se handled below)
        if body[i:i + 2] in ("as", "se"):
            symbol = body[i:i + 2].capitalize()
            i += 2
        else:
            symbol = body[i].upper()
            i += 1
        aromatic = True
    else:
        # Two-letter symbols are exact-case (second letter lowercase), so
        # the H-count marker (uppercase 'H') can never be swallowed —
        # [Rh]/[Nh]/[Th] parse as elements, [NH4+] as N + H-count.
        if i + 1 < n and body[i].isupper() and body[i + 1].islower() \
                and ATOMIC_NUM.get(body[i:i + 2]):
            symbol = body[i:i + 2]
            i += 2
        elif i < n and body[i].isupper():
            symbol = body[i]
            i += 1
        elif i < n and body[i] == "*":
            symbol = None  # wildcard: atomic number 0, as RDKit parses it
            i += 1
        else:
            raise SmilesError(f"Bad bracket atom: [{body}]")
    atomic_num = 0 if symbol is None else ATOMIC_NUM.get(symbol)
    if atomic_num is None:
        raise SmilesError(f"Unknown element in bracket atom: [{body}]")
    # chirality
    chirality = "CHI_UNSPECIFIED"
    if i < n and body[i] == "@":
        if i + 1 < n and body[i + 1] == "@":
            chirality = "CHI_TETRAHEDRAL_CW"
            i += 2
        else:
            chirality = "CHI_TETRAHEDRAL_CCW"
            i += 1
        # Named qualifier @TH1/@AL1/@SP1/@TB../@OH.. (rare). A qualifier
        # is ALWAYS two letters followed by digits — never consume a bare
        # 'H': [C@@H] keeps its hydrogen (eating it silently dropped the
        # H-count, degree, and hybridization of every chiral center).
        for q in ("TH", "AL", "SP", "TB", "OH"):
            if body[i:i + 2] == q and i + 2 < n and body[i + 2].isdigit():
                i += 2
                while i < n and body[i].isdigit():
                    i += 1
                break
    # explicit hydrogens
    num_hs = 0
    if i < n and body[i] == "H":
        i += 1
        if i < n and body[i].isdigit():
            num_hs = int(body[i])
            i += 1
        else:
            num_hs = 1
    # charge
    charge = 0
    while i < n and body[i] in "+-":
        sign = 1 if body[i] == "+" else -1
        i += 1
        if i < n and body[i].isdigit():
            charge += sign * int(body[i])
            i += 1
        else:
            charge += sign
    return Atom(
        atomic_num,
        formal_charge=charge,
        chirality=chirality,
        is_aromatic=aromatic,
        num_explicit_hs=num_hs,
    )
