"""Rendering/export tests: mesh ops, preview PNG+GIF, Luisa script export."""
import os
import tempfile

import numpy as np
import pytest

from thinshelllab_tpu.render import mesh_ops
from thinshelllab_tpu.render.engine import Renderer
from thinshelllab_tpu.scenes import folding


def test_thicken_and_subdivide():
    # single quad sheet
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    v, f = mesh_ops.thicken_cloth(verts, faces, 0.1)
    assert len(v) == 8
    # closed solid: every edge shared by exactly 2 faces
    assert len(mesh_ops.boundary_loop_edges(f)) == 0
    v2, f2 = mesh_ops.subdivide(v, f)
    assert len(f2) == 4 * len(f)


def test_export_obj(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
    faces = np.array([[0, 1, 2]])
    p = tmp_path / "m.obj"
    mesh_ops.export_obj(str(p), verts, faces)
    text = p.read_text()
    assert "v 0.0" in text and "f 1 2 3" in text


@pytest.fixture(scope="module")
def scene():
    return folding.make(table_n=4, max_newton_iter=2)


def test_preview_render(scene, tmp_path):
    r = Renderer(scene, "folding", option="Preview", save_dir=str(tmp_path))
    p = r.render("0", pos=np.asarray(scene.state0.pos))
    assert os.path.exists(p)
    r.render("1", pos=np.asarray(scene.state0.pos))
    gif = r.end_rendering(0)
    assert gif and os.path.exists(gif)


def test_luisa_export(scene, tmp_path):
    r = Renderer(scene, "folding", option="LuisaScript", save_dir=str(tmp_path))
    path = r.render("0", pos=np.asarray(scene.state0.pos))
    assert os.path.exists(path)
    text = open(path).read()
    assert "integrator" in text and "camera" in text and "shape" in text
    # obj models exported
    assert any(fn.endswith(".obj") for root, _, files in os.walk(tmp_path)
               for fn in files)


def test_bundled_asset_pack_resolves(scene, tmp_path):
    """The bundled procedural asset pack (render/gen_assets.py) makes the
    image-texture presets and environment maps resolve locally: cloth/wood
    presets become file textures and the Luisa export references existing
    image files (reference render_engine.get_asset_* lookups, which need
    an external AssetLoader directory the reference does not ship)."""
    from thinshelllab_tpu.render import textures

    d = textures.default_asset_dir()
    assert d is not None
    pre = textures.cloth_presets(d)
    assert pre["cloth_1"].kd.file and os.path.exists(pre["cloth_1"].kd.file)
    assert textures.table_presets(d)["wood_table_1"].kd.file
    env = textures.envmap_path(d, "indoor_2")
    assert env and os.path.exists(env)
    assert textures.envmap_path(d, "no_such_env") is None

    r = Renderer(scene, "folding", option="LuisaScript", save_dir=str(tmp_path))
    path = r.render("0", pos=np.asarray(scene.state0.pos))
    text = open(path).read()
    # every image file referenced by the export exists on disk
    import re

    refs = re.findall(r'file \{ "([^"]+)" \}', text)
    # inputs only: camera film targets (frame_*.exr) are render OUTPUTS
    img_refs = [p for p in refs if p.endswith((".png", ".exr"))
                and not os.path.basename(p).startswith("frame_")]
    assert img_refs, "export references no image textures"
    for p in img_refs:
        q = p if os.path.isabs(p) else os.path.join(str(tmp_path), p)
        assert os.path.exists(q), p


def test_crease_mix_texture():
    """get_mix_texture paints red (down) / blue (up) crease bands, fills the
    whole image, and the Texture mix node emits the reference grammar
    (convert_luisa.get_mix_texture:312-347, build_luisa_script mix export)."""
    import numpy as np

    from thinshelllab_tpu.render import textures
    from thinshelllab_tpu.render.luisa import Texture

    def judge(pij):
        row = pij // 4
        return "up" if row == 7 else "down" if row == 8 else None

    img = textures.get_mix_texture(15, 3, judge, img_size=256)
    assert img.shape == (256, 256, 3) and img.dtype == np.uint8
    red = (img[:, :, 0] == 255) & (img[:, :, 1] == 0) & (img[:, :, 2] == 0)
    blue = (img[:, :, 2] == 255) & (img[:, :, 0] == 0) & (img[:, :, 1] == 0)
    assert red.sum() > 0 and blue.sum() > 0
    assert (img.sum(axis=2) > 0).all()  # BFS fill leaves no black pixels

    t = Texture(mix_top=Texture(constant=(1, 1, 1)),
                mix_bottom=Texture(file="x.png"),
                mix_factor=1.0, mix_method="multiply")
    s = t.emit()
    assert "mix {" in s and '"multiply"' in s and "x.png" in s

    # uvmapping node (reference build_luisa_script.py:148-152)
    u = Texture(uv_remap=Texture(file="remap.png"),
                uv_texture=Texture(constant=(0.2, 0.3, 0.4)))
    s = u.emit()
    assert "uvmapping {" in s and "uv_map {" in s and "texture {" in s
    assert "remap.png" in s


def test_debug_plots(scene, tmp_path):
    """The three reference diagnostics (BaseScene.debug_plot /
    plot_contact_force, model_elastic_tactile.plot_normal) produce files
    and finite quantities."""
    from thinshelllab_tpu.render import debug_plots

    spec, params, st = scene.spec, scene.params, scene.state0
    p1 = debug_plots.debug_plot(spec, st.pos, 0, str(tmp_path / "dbg.png"),
                                normals=True)
    # tactile pad body = last body (gripper pad) on the folding scene
    pad = spec.n_bodies - 1
    p2 = debug_plots.plot_contact_force(spec, params, st, pad,
                                        str(tmp_path / "cf.png"))
    p3 = debug_plots.plot_normal(spec, st.pos, pad,
                                 str(tmp_path / "nrm.png"))
    for p in (p1, p2, p3):
        assert os.path.getsize(p) > 0
    f = np.asarray(debug_plots.contact_forces(spec, params, st))
    assert np.all(np.isfinite(f))
