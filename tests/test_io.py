"""IO layer: GIfTI/NIfTI/FreeSurfer roundtrips, mesh utilities, k-NN adjacency."""

import numpy as np
from sklearn.neighbors import NearestNeighbors

from multimodal_decoding_tpu.io import gifti, nifti, surface


def test_gifti_roundtrip(tmp_path, rng):
    data = rng.randn(100).astype(np.float32)
    path = str(tmp_path / "x.gii")
    gifti.write_gifti(path, data)
    back = gifti.read_gifti(path)
    np.testing.assert_array_equal(back.darrays[0].data, data)

    # float64 downcast like the reference exporter (utils.py:103)
    gifti.export_to_gifti(rng.randn(50), str(tmp_path / "y.gii"))
    y = gifti.read_gifti(str(tmp_path / "y.gii")).data
    assert y.dtype == np.float32

    # multi-array (mesh-style: pointset + triangles)
    coords = rng.randn(10, 3).astype(np.float32)
    faces = rng.randint(0, 10, (6, 3)).astype(np.int32)
    gifti.write_gifti(
        str(tmp_path / "mesh.gii"), [coords, faces],
        [gifti.INTENT_POINTSET, gifti.INTENT_TRIANGLE],
    )
    mesh = gifti.read_gifti(str(tmp_path / "mesh.gii"))
    np.testing.assert_array_equal(mesh.darrays[0].data, coords)
    np.testing.assert_array_equal(mesh.darrays[1].data, faces)
    assert mesh.darrays[1].intent == gifti.INTENT_TRIANGLE


def test_gifti_nan_preserved(tmp_path):
    data = np.array([1.0, np.nan, 3.0], dtype=np.float32)
    path = str(tmp_path / "nan.gii")
    gifti.write_gifti(path, data)
    back = gifti.read_gifti(path).data
    assert np.isnan(back[1]) and back[0] == 1.0


def test_nifti_roundtrip(tmp_path, rng):
    vol = rng.randn(5, 4, 3).astype(np.float32)
    path = str(tmp_path / "x.nii")
    nifti.write_nifti(path, vol, descrip="beta train_image 12345")
    img = nifti.read_nifti(path)
    np.testing.assert_allclose(img.data, vol, atol=0)
    assert img.descrip == "beta train_image 12345"
    # fortran-order flattening matches nibabel's get_fdata().reshape(-1)
    np.testing.assert_allclose(
        img.get_fdata().astype("float32").reshape(-1), vol.reshape(-1)
    )

    # gz variant
    nifti.write_nifti(str(tmp_path / "y.nii.gz"), vol)
    np.testing.assert_allclose(nifti.read_nifti(str(tmp_path / "y.nii.gz")).data, vol)


def test_freesurfer_geometry_roundtrip(tmp_path):
    mesh = surface.icosphere(subdivisions=1)
    path = str(tmp_path / "lh.inflated")
    surface.write_freesurfer_geometry(path, mesh)
    back = surface.read_freesurfer_geometry(path)
    np.testing.assert_allclose(back.coordinates, mesh.coordinates, atol=1e-6)
    np.testing.assert_array_equal(back.faces, mesh.faces)


def test_icosphere_topology():
    for sub, v in [(0, 12), (1, 42), (2, 162), (3, 642)]:
        mesh = surface.icosphere(subdivisions=sub)
        assert mesh.n_vertices == v  # 10*4^n + 2, the fsaverage family sizes
        # closed surface: euler characteristic V - E + F = 2
        e = len(surface.mesh_edges(mesh))
        assert mesh.n_vertices - e + len(mesh.faces) == 2


def test_knn_adjacency_matches_sklearn(rng):
    coords = rng.randn(200, 3).astype(np.float32) * 30
    k = 10
    # exact method: bit-parity with sklearn
    idx, dist = surface.knn_adjacency(coords, k)
    ref_dist, ref_idx = NearestNeighbors().fit(coords).kneighbors(coords, n_neighbors=k)
    np.testing.assert_array_equal(idx, ref_idx)
    np.testing.assert_allclose(dist, ref_dist, atol=1e-4)
    np.testing.assert_array_equal(idx[:, 0], np.arange(200))

    # device method: same neighbour sets up to f32 boundary near-ties
    idx_d, dist_d = surface.knn_adjacency(coords, k, block=64, method="device")
    set_match = np.mean(
        [len(set(a) & set(b)) / k for a, b in zip(idx_d.tolist(), ref_idx.tolist())]
    )
    assert set_match > 0.98
    np.testing.assert_allclose(np.sort(dist_d, 1), np.sort(ref_dist, 1), atol=0.05)


def test_radius_adjacency_matches_sklearn(rng):
    coords = rng.randn(120, 3).astype(np.float32) * 10
    radius = 8.0
    idx, mask, counts = surface.radius_adjacency(coords, radius)
    nn = NearestNeighbors(radius=radius).fit(coords)
    graph = nn.radius_neighbors_graph(coords).toarray()
    for v in range(120):
        ref = set(np.where(graph[v] == 1)[0])
        ref.add(v)  # sklearn's graph excludes self; reference counts it via ==1 check
        ours = set(idx[v][mask[v]].tolist())
        assert ours == ref, v
    # counts match mask sums
    np.testing.assert_array_equal(counts, mask.sum(axis=1))


def test_edge_lengths_match_reference_construction():
    mesh = surface.icosphere(subdivisions=1)
    # reference construction (cluster_analysis.py:238-243): vstack face pairs,
    # normalise (min,max), dict -> implicit dedup
    f = mesh.faces
    e = np.vstack([f[:, [0, 1]], f[:, [0, 2]], f[:, [1, 2]]])
    e = np.array([(a, b) if a < b else (b, a) for a, b in e])
    lengths = np.sqrt(((mesh.coordinates[e[:, 0]] - mesh.coordinates[e[:, 1]]) ** 2).sum(1))
    ref = {(int(a), int(b)): float(l) for (a, b), l in zip(e, lengths)}
    ours = surface.edge_lengths_dict(mesh)
    assert ours.keys() == ref.keys()
    for k in ref:
        assert abs(ours[k] - ref[k]) < 1e-6
