"""Target export tests: printable nets, per-face PNGs, net unfolding."""
import numpy as np
import pytest
from cv2 import aruco


class TestCcubeExport:
    @pytest.fixture(scope="class")
    def cube(self):
        from pycamset_tpu.models.ccube import Ccube
        return Ccube(n_points=5, length=20, draw_res=(400, 400))

    def test_point_data_geometry(self, cube):
        pts = cube.point_data
        assert pts.shape == (6, 16, 3)
        # all corners inside the cube volume, faces on the surface
        half = cube.length
        assert np.all(pts >= -1e-9 - half) and np.all(pts <= half + 1e-9)
        # opposing-corner distance smaller than the space diagonal
        assert np.linalg.norm(pts.reshape(-1, 3).max(0)
                              - pts.reshape(-1, 3).min(0)) <= np.sqrt(3) * half * 1.01

    def test_local_coords_are_planar(self, cube):
        local = cube.point_local
        assert np.allclose(local[..., 2], 0, atol=1e-12)

    def test_save_net_pdf(self, cube, tmp_path):
        out = tmp_path / "net.pdf"
        cube.save_to_pdf(f_out=out)
        assert out.exists() and out.stat().st_size > 10_000

    def test_save_individual_faces(self, cube, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        cube.save_to_pdf(individual_faces=True)
        pngs = list(tmp_path.glob("*.png"))
        assert len(pngs) == 6


class TestNetMaker:
    def test_cube_net_unfolds(self):
        from pycamset_tpu.models.shape_by_faces import (
            make_net_tforms, make_tforms)
        base = np.array([[0, 1, 0], [1, 1, 0], [1, 0, 0], [0, 0, 0]],
                        dtype=float)
        tforms = make_tforms(base, "cube")
        assert len(tforms) == 6
        # faces share the unit-cube vertex set
        from pycamset_tpu.utils.general_utils import h_tform, make_4x4h_tform
        verts = set()
        for rvec, t in tforms:
            pts = h_tform(base, make_4x4h_tform(rvec, t))
            for p in pts:
                verts.add(tuple(np.round(p, 5)))
        assert len(verts) == 8

        # unfold: every face placed, first at identity
        known, faces = [], []
        for rvec, t in tforms:
            pts = h_tform(base, make_4x4h_tform(rvec, t))
            face = [4]
            for p in pts:
                for idx, q in enumerate(known):
                    if np.linalg.norm(np.array(q) - p) < 1e-5:
                        face.append(idx)
                        break
                else:
                    face.append(len(known))
                    known.append(tuple(p))
            faces.extend(face)
        # build the unfold tree from actual shared-edge adjacency (BFS)
        from pycamset_tpu.models.shape_by_faces import make_ragged_faces
        ragged = make_ragged_faces(faces)
        adj = {i: [] for i in range(6)}
        for i in range(6):
            for j in range(i + 1, 6):
                if len(set(ragged[i]) & set(ragged[j])) == 2:
                    adj[i].append(j)
                    adj[j].append(i)
        connections, seen, frontier = [], {0}, [0]
        while frontier:
            nxt = []
            for f in frontier:
                children = [n for n in adj[f] if n not in seen]
                if children:
                    connections += [len(children), f] + children
                    seen.update(children)
                    nxt += children
            frontier = nxt

        base2d = np.array([[1.0, 1], [1, 0], [0, 0], [0, 1]])
        net = make_net_tforms(base2d, faces, connections)
        assert all(t is not None for t in net)
        np.testing.assert_allclose(net[0], np.eye(3))


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
