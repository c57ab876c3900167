"""Gmsh ``.msh`` reader/writer (ASCII, formats 2.2 and 4.1) in pure numpy.

The environment ships neither ``meshio`` nor ``gmsh``, so femx carries its own
parser. It covers everything the reference workflows produce/consume:
format 4.1 written by gmsh itself (e.g. /root/reference/cantilever_beam) and
format 2.2 as a simple interchange format. Only the sections the solvers need
are parsed ($PhysicalNames, $Entities, $Nodes, $Elements); others are skipped.

An optional C++ fast path (femx._native, built from native/fast_tokens.cpp)
accelerates tokenization of large files; the numpy path is the reference
implementation.
"""

from __future__ import annotations

import io
from typing import Dict, List, Tuple

import numpy as np

from femx.mesh.core import GMSH_TYPE_TO_NAME, NAME_TO_GMSH_TYPE, Mesh


class _Tokens:
    """Numeric token stream over a purely-numeric .msh section body.

    Backed by one bulk parse into float64 (C++ fast path via femx._native
    when built, numpy otherwise) — integer tags up to 2^53 are exact in
    float64, far beyond any practical node count.
    """

    def __init__(self, body: str):
        from femx._native import parse_numbers

        self.a = parse_numbers(body)
        self.i = 0

    def next_int(self) -> int:
        v = int(self.a[self.i])
        self.i += 1
        return v

    def next_float(self) -> float:
        v = float(self.a[self.i])
        self.i += 1
        return v

    def take_ints(self, n: int) -> np.ndarray:
        out = self.a[self.i : self.i + n].astype(np.int64)
        self.i += n
        return out

    def take_floats(self, n: int) -> np.ndarray:
        out = self.a[self.i : self.i + n]
        self.i += n
        return out


def _split_sections(text: str) -> Dict[str, str]:
    sections: Dict[str, str] = {}
    pos = 0
    while True:
        start = text.find("$", pos)
        if start < 0:
            break
        eol = text.find("\n", start)
        name = text[start + 1 : eol].strip()
        end_marker = f"$End{name}"
        end = text.find(end_marker, eol)
        if end < 0:
            raise ValueError(f"Unterminated section ${name} in .msh file")
        sections[name] = text[eol + 1 : end]
        pos = end + len(end_marker)
    return sections


def _parse_physical_names(body: str) -> Dict[str, Tuple[int, int]]:
    lines = [ln for ln in body.strip().splitlines() if ln.strip()]
    n = int(lines[0])
    field_data: Dict[str, Tuple[int, int]] = {}
    for ln in lines[1 : 1 + n]:
        dim_s, tag_s, name = ln.strip().split(None, 2)
        field_data[name.strip().strip('"')] = (int(tag_s), int(dim_s))
    return field_data


def _parse_entities_41(body: str) -> Dict[Tuple[int, int], List[int]]:
    """Entity (dim, tag) -> list of physical tags, from a 4.1 $Entities body."""
    t = _Tokens(body)
    counts = [t.next_int() for _ in range(4)]  # points, curves, surfaces, volumes
    ent_phys: Dict[Tuple[int, int], List[int]] = {}
    # Points: tag x y z numPhys phys...
    for _ in range(counts[0]):
        tag = t.next_int()
        t.take_floats(3)
        nphys = t.next_int()
        ent_phys[(0, tag)] = [t.next_int() for _ in range(nphys)]
    # Curves/surfaces/volumes: tag bbox(6) numPhys phys... numBound bound...
    for dim in (1, 2, 3):
        for _ in range(counts[dim]):
            tag = t.next_int()
            t.take_floats(6)
            nphys = t.next_int()
            ent_phys[(dim, tag)] = [t.next_int() for _ in range(nphys)]
            nbound = t.next_int()
            t.take_ints(nbound)
    return ent_phys


def _read_msh41(sections: Dict[str, str]) -> Mesh:
    field_data = (
        _parse_physical_names(sections["PhysicalNames"]) if "PhysicalNames" in sections else {}
    )
    ent_phys = _parse_entities_41(sections["Entities"]) if "Entities" in sections else {}

    # --- $Nodes: numBlocks numNodes minTag maxTag; blocks of tagged nodes ---
    t = _Tokens(sections["Nodes"])
    num_blocks, num_nodes, min_tag, max_tag = (t.next_int() for _ in range(4))
    tags = np.empty(num_nodes, dtype=np.int64)
    coords = np.empty((num_nodes, 3), dtype=np.float64)
    filled = 0
    for _ in range(num_blocks):
        _dim, _etag, parametric, n_in_block = (t.next_int() for _ in range(4))
        if parametric:
            raise ValueError("Parametric nodes are not supported")
        tags[filled : filled + n_in_block] = t.take_ints(n_in_block)
        coords[filled : filled + n_in_block] = t.take_floats(3 * n_in_block).reshape(-1, 3)
        filled += n_in_block
    assert filled == num_nodes
    # Map (possibly sparse) node tags -> dense 0-based index, preserving file order.
    tag_to_idx = np.full(max_tag + 1, -1, dtype=np.int64)
    tag_to_idx[tags] = np.arange(num_nodes)

    # --- $Elements: numBlocks numElements minTag maxTag; typed blocks ---
    t = _Tokens(sections["Elements"])
    num_blocks, _num_elems, _mn, _mx = (t.next_int() for _ in range(4))
    cells: Dict[str, List[np.ndarray]] = {}
    phys: Dict[str, List[np.ndarray]] = {}
    for _ in range(num_blocks):
        dim, etag, etype, n_in_block = (t.next_int() for _ in range(4))
        if etype not in GMSH_TYPE_TO_NAME:
            raise ValueError(f"Unsupported gmsh element type {etype}")
        name, npc = GMSH_TYPE_TO_NAME[etype]
        rows = t.take_ints(n_in_block * (1 + npc)).reshape(n_in_block, 1 + npc)
        conn = tag_to_idx[rows[:, 1:]]
        ptags = ent_phys.get((dim, etag), [])
        ptag = ptags[0] if ptags else 0
        cells.setdefault(name, []).append(conn)
        phys.setdefault(name, []).append(np.full(n_in_block, ptag, dtype=np.int32))

    return Mesh(
        points=coords,
        cells={k: np.concatenate(v).astype(np.int32) for k, v in cells.items()},
        cell_physical={k: np.concatenate(v) for k, v in phys.items()},
        field_data=field_data,
    )


def _read_msh22(sections: Dict[str, str]) -> Mesh:
    field_data = (
        _parse_physical_names(sections["PhysicalNames"]) if "PhysicalNames" in sections else {}
    )
    t = _Tokens(sections["Nodes"])
    num_nodes = t.next_int()
    rows = t.take_floats(4 * num_nodes).reshape(num_nodes, 4)
    tags = rows[:, 0].astype(np.int64)
    coords = rows[:, 1:4]
    tag_to_idx = np.full(tags.max() + 1, -1, dtype=np.int64)
    tag_to_idx[tags] = np.arange(num_nodes)

    t = _Tokens(sections["Elements"])
    num_elems = t.next_int()
    cells: Dict[str, List[np.ndarray]] = {}
    phys: Dict[str, List[np.ndarray]] = {}
    for _ in range(num_elems):
        _etag = t.next_int()
        etype = t.next_int()
        ntags = t.next_int()
        etags = t.take_ints(ntags)
        if etype not in GMSH_TYPE_TO_NAME:
            raise ValueError(f"Unsupported gmsh element type {etype}")
        name, npc = GMSH_TYPE_TO_NAME[etype]
        conn = tag_to_idx[t.take_ints(npc)]
        cells.setdefault(name, []).append(conn)
        phys.setdefault(name, []).append(np.array([etags[0] if ntags else 0], dtype=np.int32))

    return Mesh(
        points=coords,
        cells={k: np.stack(v).astype(np.int32) for k, v in cells.items()},
        cell_physical={k: np.concatenate(v) for k, v in phys.items()},
        field_data=field_data,
    )


def read_msh(path_or_text) -> Mesh:
    """Read an ASCII Gmsh .msh file (format 2.2 or 4.1) into a Mesh."""
    if hasattr(path_or_text, "read"):
        text = path_or_text.read()
    elif isinstance(path_or_text, str) and "$MeshFormat" in path_or_text:
        text = path_or_text
    else:
        with open(path_or_text, "r") as f:
            text = f.read()
    sections = _split_sections(text)
    if "MeshFormat" not in sections:
        raise ValueError("Not a Gmsh .msh file (missing $MeshFormat)")
    version_s, file_type, _dsize = sections["MeshFormat"].split()[:3]
    if int(file_type) != 0:
        raise ValueError("Binary .msh files are not supported; export as ASCII")
    version = float(version_s)
    if version >= 4.0:
        mesh = _read_msh41(sections)
    elif version >= 2.0:
        mesh = _read_msh22(sections)
    else:
        raise ValueError(f"Unsupported .msh version {version_s}")
    mesh.validate()
    return mesh


def write_msh(path, mesh: Mesh, fmt: str = "2.2") -> None:
    """Write a Mesh as ASCII .msh (format 2.2, readable by gmsh and femx)."""
    if fmt != "2.2":
        raise ValueError("Only ASCII 2.2 output is implemented")
    buf = io.StringIO()
    buf.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
    if mesh.field_data:
        buf.write("$PhysicalNames\n%d\n" % len(mesh.field_data))
        for name, (tag, dim) in sorted(mesh.field_data.items(), key=lambda kv: kv[1][0]):
            buf.write(f'{dim} {tag} "{name}"\n')
        buf.write("$EndPhysicalNames\n")
    buf.write("$Nodes\n%d\n" % mesh.num_nodes)
    for i, p in enumerate(mesh.points):
        buf.write(f"{i + 1} {p[0]:.16g} {p[1]:.16g} {p[2]:.16g}\n")
    buf.write("$EndNodes\n")
    total = sum(len(c) for c in mesh.cells.values())
    buf.write("$Elements\n%d\n" % total)
    eid = 1
    for name, conn in mesh.cells.items():
        etype = NAME_TO_GMSH_TYPE[name]
        phys = mesh.cell_physical.get(name, np.zeros(len(conn), dtype=np.int32))
        for row, ptag in zip(conn, phys):
            nodes = " ".join(str(int(n) + 1) for n in row)
            buf.write(f"{eid} {etype} 2 {int(ptag)} {int(ptag)} {nodes}\n")
            eid += 1
    buf.write("$EndElements\n")
    if hasattr(path, "write"):
        path.write(buf.getvalue())
    else:
        with open(path, "w") as f:
            f.write(buf.getvalue())
