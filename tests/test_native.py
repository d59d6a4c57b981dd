"""Native C++ mesh kernel vs the numpy reference implementation."""
import numpy as np
import pytest

from pvtrace_tpu import native


def icosahedron():
    phi = (1 + np.sqrt(5)) / 2
    v = np.array(
        [
            [-1, phi, 0], [1, phi, 0], [-1, -phi, 0], [1, -phi, 0],
            [0, -1, phi], [0, 1, phi], [0, -1, -phi], [0, 1, -phi],
            [phi, 0, -1], [phi, 0, 1], [-phi, 0, -1], [-phi, 0, 1],
        ],
        dtype=float,
    )
    v /= np.linalg.norm(v[0])
    f = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int64,
    )
    return v, f


needs_native = pytest.mark.skipif(
    not native.is_available(), reason="native mesh kernel not built"
)


@needs_native
class TestNativeKernel:
    def test_ray_hits_match_numpy(self):
        from pvtrace_tpu.geometry.mesh import Mesh

        v, f = icosahedron()
        mesh = Mesh((v, f))
        kernel = native.MeshKernel(mesh.vertices, mesh.faces)

        rng = np.random.RandomState(0)
        for _ in range(50):
            origin = rng.uniform(-3, 3, 3)
            direction = rng.normal(size=3)
            direction /= np.linalg.norm(direction)
            ts, faces = kernel.ray_hits(origin, direction, t_min=0.0)
            # numpy reference
            mesh_np = Mesh((v, f))
            mesh_np._kernel = None
            ts_np, _ = mesh_np._ray_hits(origin, direction)
            ts_np = np.sort(ts_np[ts_np >= 0.0])
            assert np.allclose(np.sort(ts), ts_np, atol=1e-9)

    def test_contains(self):
        v, f = icosahedron()
        kernel = native.MeshKernel(v, f)
        assert kernel.contains(np.zeros(3))
        assert not kernel.contains(np.array([2.0, 0.0, 0.0]))

    def test_nearest_face(self):
        v, f = icosahedron()
        kernel = native.MeshKernel(v, f)
        face, dist = kernel.nearest_face(np.array([0.0, 0.0, 1.5]))
        assert 0 <= face < len(f)
        assert 0.4 < dist < 0.7

    def test_batch_intersect(self):
        v, f = icosahedron()
        kernel = native.MeshKernel(v, f)
        n = 1000
        rng = np.random.RandomState(1)
        origins = np.tile([0.0, 0.0, -5.0], (n, 1))
        dirs = rng.normal(size=(n, 3))
        dirs[:, 2] = np.abs(dirs[:, 2]) + 2.0  # roughly towards the mesh
        dirs /= np.linalg.norm(dirs, axis=1)[:, None]
        out_t, out_count = kernel.batch_intersect(origins, dirs)
        hit = out_count >= 2
        assert hit.sum() > 100
        # entry before exit
        assert np.all(out_t[hit, 0] <= out_t[hit, 1])

    def test_mesh_tracing_end_to_end(self):
        """A mesh node traced by the oracle (engine rejects meshes)."""
        from pvtrace_tpu import Light, Material, Node, Scene, Sphere, photon_tracer
        from pvtrace_tpu.geometry.mesh import Mesh

        v, f = icosahedron()
        world = Node(
            name="world",
            geometry=Sphere(radius=10.0, material=Material(refractive_index=1.0)),
        )
        Node(
            name="ico",
            geometry=Mesh((v, f), material=Material(refractive_index=1.5)),
            parent=world,
        )
        light = Node(name="light", light=Light(), parent=world)
        light.translate((0.0, 0.0, -5.0))
        scene = Scene(world)
        np.random.seed(0)
        for ray in scene.emit(10):
            events = [e.name for _, e in photon_tracer.follow(scene, ray)]
            assert events[-1] == "EXIT"
            assert "TRANSMIT" in events or "REFLECT" in events
