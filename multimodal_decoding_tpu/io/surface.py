"""Surface meshes: FreeSurfer geometry IO, synthetic meshes, edges, k-NN.

The reference fetches fsaverage meshes through nilearn
(/root/reference/analyses/decoding/searchlight/searchlight.py:152-159) and
builds vertex adjacency with sklearn NearestNeighbors (:160-178).  Here:

* FreeSurfer binary geometry files (``lh.inflated`` etc.) are parsed directly
  (big-endian triangle-file format), since nilearn/nibabel are not bundled.
* Synthetic icosphere meshes provide test/bench geometry with the same
  topology class as fsaverage (fsaverageN *is* a subdivided icosahedron:
  V = 10*4^N + 2).
* k-NN adjacency is computed on-device: pairwise squared distances in vertex
  blocks + ``jax.lax.top_k`` — the searchlight patch definition becomes a
  [V, K] int32 tensor with static K (SURVEY.md §7 step 4).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

TRIANGLE_MAGIC = 0xFFFFFE


@dataclass
class SurfaceMesh:
    coordinates: np.ndarray  # [V, 3] float32
    faces: np.ndarray  # [F, 3] int32

    @property
    def n_vertices(self) -> int:
        return len(self.coordinates)


def _read_int3(f) -> int:
    b = f.read(3)
    return (b[0] << 16) | (b[1] << 8) | b[2]


def read_freesurfer_geometry(path: str) -> SurfaceMesh:
    """Parse a FreeSurfer binary triangle-surface file (big-endian)."""
    with open(path, "rb") as f:
        magic = _read_int3(f)
        if magic != TRIANGLE_MAGIC:
            raise ValueError(f"Not a FreeSurfer triangle file (magic={magic:#x}): {path}")
        # "created by" comment: terminated by two newline bytes
        prev = b""
        while True:
            c = f.read(1)
            if c == b"" or (prev == b"\n" and c == b"\n"):
                break
            prev = c
        n_vertices, n_faces = struct.unpack(">ii", f.read(8))
        coords = np.frombuffer(f.read(n_vertices * 12), dtype=">f4").reshape(n_vertices, 3)
        faces = np.frombuffer(f.read(n_faces * 12), dtype=">i4").reshape(n_faces, 3)
    return SurfaceMesh(
        coords.astype(np.float32), faces.astype(np.int32)
    )


def write_freesurfer_geometry(path: str, mesh: SurfaceMesh, comment: str = "mmd_tpu") -> None:
    with open(path, "wb") as f:
        f.write(bytes([(TRIANGLE_MAGIC >> 16) & 0xFF, (TRIANGLE_MAGIC >> 8) & 0xFF, TRIANGLE_MAGIC & 0xFF]))
        f.write(comment.encode() + b"\n\n")
        f.write(struct.pack(">ii", mesh.n_vertices, len(mesh.faces)))
        f.write(mesh.coordinates.astype(">f4").tobytes())
        f.write(mesh.faces.astype(">i4").tobytes())


def icosphere(subdivisions: int = 2, radius: float = 100.0) -> SurfaceMesh:
    """Subdivided icosahedron; same topology family as fsaverage meshes."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=np.float64,
    )
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int64,
    )

    def normalize(v):
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    verts = normalize(verts)
    for _ in range(subdivisions):
        edge_mid = {}
        new_faces = []
        verts_list = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                m = normalize((verts_list[a] + verts_list[b]) / 2.0)
                verts_list.append(m)
                edge_mid[key] = len(verts_list) - 1
            return edge_mid[key]

        for f0, f1, f2 in faces:
            m01, m12, m20 = midpoint(f0, f1), midpoint(f1, f2), midpoint(f2, f0)
            new_faces += [[f0, m01, m20], [f1, m12, m01], [f2, m20, m12], [m01, m12, m20]]
        verts = np.array(verts_list)
        faces = np.array(new_faces, dtype=np.int64)

    return SurfaceMesh((verts * radius).astype(np.float32), faces.astype(np.int32))


def mesh_edges(mesh: SurfaceMesh) -> np.ndarray:
    """Unique undirected edges [(min, max)] from faces, sorted.

    Same edge set as the reference's face-based construction
    (cluster_analysis.py:231-245) but deduplicated (the reference keeps
    duplicate dict insertions which collapse to the same keys).
    """
    f = mesh.faces
    e = np.vstack([f[:, [0, 1]], f[:, [0, 2]], f[:, [1, 2]]])
    e = np.sort(e, axis=1)
    e = np.unique(e, axis=0)
    return e


def edge_lengths(mesh: SurfaceMesh):
    """(edges [E,2], lengths [E]) with Euclidean lengths on the mesh coords."""
    e = mesh_edges(mesh)
    d = np.sqrt(np.sum((mesh.coordinates[e[:, 0]] - mesh.coordinates[e[:, 1]]) ** 2, axis=1))
    return e, d


def edge_lengths_dict(mesh: SurfaceMesh) -> dict:
    """{(v0, v1): length} dict, reference contract (cluster_analysis.py:243)."""
    e, d = edge_lengths(mesh)
    return {(int(a), int(b)): float(l) for (a, b), l in zip(e, d)}


def knn_adjacency(coords: np.ndarray, k: int, block: int = 4096, method: str = "exact"):
    """k-NN over mesh coordinates.

    Returns (indices [V, k] int32, distances [V, k] float32), sorted by
    distance with the query point first — matching sklearn
    ``NearestNeighbors.kneighbors`` output (searchlight.py:173) used for the
    n_neighbors searchlight mode.

    method="exact" (default) uses sklearn's KD-tree in float64 — the
    adjacency is a build-once cached artifact, so exact reference parity wins
    over speed.  method="device" runs blocked |q|^2-2qp+|p|^2 + top_k on the
    accelerator (f32; boundary neighbours may differ on near-ties).
    """
    if method == "exact":
        from sklearn.neighbors import NearestNeighbors

        # n_jobs=-1: the fsaverage7 build is ~680 s single-core (measured,
        # benchmarks/profile_run_overheads.py) and embarrassingly parallel
        # over queries; same exact KD-tree, same output
        nn = NearestNeighbors(n_jobs=-1).fit(coords)
        dists, idx = nn.kneighbors(coords, n_neighbors=k)
        return idx.astype(np.int32), dists.astype(np.float32)
    import jax
    import jax.numpy as jnp

    coords = np.asarray(coords, dtype=np.float32)
    v = len(coords)
    all_pts = jnp.asarray(coords)
    sq_norms = jnp.sum(all_pts * all_pts, axis=1)

    @jax.jit
    def block_knn(queries, q_sq):
        # d^2 = |q|^2 - 2 q.p + |p|^2
        cross = jnp.matmul(queries, all_pts.T, preferred_element_type=jnp.float32)
        d2 = q_sq[:, None] - 2.0 * cross + sq_norms[None, :]
        neg_d2, idx = jax.lax.top_k(-d2, k)
        return idx, jnp.sqrt(jnp.maximum(-neg_d2, 0.0))

    indices = np.empty((v, k), dtype=np.int32)
    dists = np.empty((v, k), dtype=np.float32)
    for start in range(0, v, block):
        q = all_pts[start : start + block]
        q_sq = sq_norms[start : start + block]
        idx, d = block_knn(q, q_sq)
        indices[start : start + len(q)] = np.asarray(idx)
        dists[start : start + len(q)] = np.asarray(d)
    return indices, dists


def radius_adjacency(coords: np.ndarray, radius: float):
    """Radius-ball adjacency as a padded/masked fixed-shape tensor.

    The reference's radius mode returns ragged per-vertex lists
    (searchlight.py:164-171); TPU-native equivalent: pad every neighbourhood
    to the max count and return (indices [V, Kmax], mask [V, Kmax],
    n_neighbors [V]).  Padded slots repeat the vertex itself and are masked
    out of the ridge fit.
    """
    import jax
    import jax.numpy as jnp

    coords = np.asarray(coords, dtype=np.float32)
    v = len(coords)
    pts = jnp.asarray(coords)
    sq = jnp.sum(pts * pts, axis=1)
    r2 = float(radius) ** 2

    @jax.jit
    def counts_block(queries, q_sq):
        d2 = q_sq[:, None] - 2.0 * jnp.matmul(queries, pts.T) + sq[None, :]
        return jnp.sum(d2 <= r2, axis=1)

    counts = np.concatenate(
        [np.asarray(counts_block(pts[s : s + 4096], sq[s : s + 4096])) for s in range(0, v, 4096)]
    )
    kmax = int(counts.max())

    @jax.jit
    def topk_block(queries, q_sq):
        d2 = q_sq[:, None] - 2.0 * jnp.matmul(queries, pts.T) + sq[None, :]
        neg, idx = jax.lax.top_k(-d2, kmax)
        return idx, -neg

    indices = np.empty((v, kmax), dtype=np.int32)
    mask = np.empty((v, kmax), dtype=bool)
    row = 0
    for s in range(0, v, 4096):
        idx, d2 = topk_block(pts[s : s + 4096], sq[s : s + 4096])
        idx, d2 = np.asarray(idx), np.asarray(d2)
        m = d2 <= r2
        # padded slots point at the vertex itself (first neighbour)
        idx = np.where(m, idx, idx[:, :1])
        indices[row : row + len(idx)] = idx
        mask[row : row + len(idx)] = m
        row += len(idx)
    return indices, mask, counts
