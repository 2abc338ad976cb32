"""FBX ASCII importer (poselib FBX backend replacement, SURVEY §2.5)."""

import os

import numpy as np
import pytest

from vid2player3d_tpu.core.fbx import (FBX_TIME_PER_SECOND, import_fbx_motion,
                                       parse_fbx_ascii)

_KT = FBX_TIME_PER_SECOND


def _fixture_text():
    """Minimal FBX 7.x ASCII: Hips -> Spine -> Head chain, 1-second rotation
    animation on the Hips X channel (0° -> 90°)."""
    return f"""; FBX 7.4 project file
FBXHeaderExtension:  {{
    FBXVersion: 7400
}}
Objects:  {{
    Model: 1001, "Model::Hips", "LimbNode" {{
        Properties70:  {{
            P: "Lcl Translation", "Lcl Translation", "", "A", 0.0, 1.0, 0.0
            P: "Lcl Rotation", "Lcl Rotation", "", "A", 0.0, 0.0, 0.0
        }}
    }}
    Model: 1002, "Model::Spine", "LimbNode" {{
        Properties70:  {{
            P: "Lcl Translation", "Lcl Translation", "", "A", 0.0, 0.2, 0.0
            P: "PreRotation", "Vector3D", "", "", 0.0, 0.0, 90.0
        }}
    }}
    Model: 1003, "Model::Head", "LimbNode" {{
        Properties70:  {{
            P: "Lcl Translation", "Lcl Translation", "", "A", 0.0, 0.3, 0.0
        }}
    }}
    AnimationCurveNode: 2001, "AnimCurveNode::R", "" {{
    }}
    AnimationCurve: 3001, "AnimCurve::", "" {{
        KeyTime: *2 {{
            a: 0,{_KT}
        }}
        KeyValueFloat: *2 {{
            a: 0.0,90.0
        }}
    }}
}}
Connections:  {{
    C: "OO",1001,0
    C: "OO",1002,1001
    C: "OO",1003,1002
    C: "OP",2001,1001, "Lcl Rotation"
    C: "OP",3001,2001, "d|X"
}}
"""


def test_parser_structure():
    doc = parse_fbx_ascii(_fixture_text())
    objs = doc.first("Objects")
    assert objs is not None
    assert len(objs.find("Model")) == 3
    curve = objs.find("AnimationCurve")[0]
    kt = curve.first("KeyTime")
    assert kt.first("a").props == [0, _KT]


def test_import_motion(tmp_path):
    p = os.path.join(tmp_path, "clip.fbx")
    with open(p, "w") as f:
        f.write(_fixture_text())
    motion = import_fbx_motion(p, fps=30.0)

    tree = motion.tree
    assert tree.node_names == ("Hips", "Spine", "Head")
    assert list(np.asarray(tree.parent_indices)) == [-1, 0, 1]
    np.testing.assert_allclose(np.asarray(tree.local_translation)[2],
                               [0.0, 0.3, 0.0], atol=1e-6)

    # 1 second at 30 fps -> 31 frames
    assert motion.num_frames == 31
    # frame 0: identity hips rotation; last frame: 90° about x
    q0 = motion.local_rotation[0, 0]
    qT = motion.local_rotation[-1, 0]
    np.testing.assert_allclose(q0, [0, 0, 0, 1], atol=1e-5)
    s = np.sin(np.pi / 4)
    np.testing.assert_allclose(np.abs(qT), [s, 0, 0, s], atol=1e-4)
    # PreRotation on Spine: constant 90° about z
    qs = motion.local_rotation[0, 1]
    np.testing.assert_allclose(np.abs(qs), [0, 0, s, s], atol=1e-4)
    # root translation from the rest offset
    np.testing.assert_allclose(motion.root_translation[0], [0.0, 1.0, 0.0],
                               atol=1e-5)
    # FK caches computed without error
    assert np.all(np.isfinite(motion.global_translation))


def test_truncated_binary_rejected(tmp_path):
    """A header-only binary file must fail cleanly, not crash the parser."""
    p = os.path.join(tmp_path, "bin.fbx")
    with open(p, "wb") as f:
        f.write(b"Kaydara FBX Binary  \x00\x1a\x00" + b"\x28\x1c\x00\x00")
    with pytest.raises(ValueError, match="Objects"):
        import_fbx_motion(p)


# ---- binary (Kaydara) container --------------------------------------------

def _i64_array(vals):
    import struct
    raw = b"".join(struct.pack("<q", v) for v in vals)
    return b"l" + struct.pack("<III", len(vals), 0, len(raw)) + raw


def _f32_array(vals):
    import struct
    raw = b"".join(struct.pack("<f", v) for v in vals)
    return b"f" + struct.pack("<III", len(vals), 0, len(raw)) + raw


def _fixture_binary():
    """The same scene as `_fixture_text`, in the binary Kaydara container."""
    import struct

    def node(name, props=(), children=()):
        return ("node", name.encode(), props, _plist(props), children)

    def _plist(props):
        return b"".join(_enc(p) for p in props)

    def _enc(p):
        if isinstance(p, bytes):
            return p
        if isinstance(p, str):
            parts = p.split("::")
            raw = b"\x00\x01".join(s.encode() for s in reversed(parts)) \
                if len(parts) > 1 else p.encode()
            return b"S" + struct.pack("<I", len(raw)) + raw
        if isinstance(p, float):
            return b"D" + struct.pack("<d", p)
        return b"L" + struct.pack("<q", p)

    def P(*vals):
        return node("P", vals)

    def model(mid, name, t=None, pre=None):
        props70 = []
        if t is not None:
            props70.append(P("Lcl Translation", "Lcl Translation", "", "A",
                             *[float(x) for x in t]))
        if pre is not None:
            props70.append(P("PreRotation", "Vector3D", "", "",
                             *[float(x) for x in pre]))
        return node("Model", (mid, f"Model::{name}", "LimbNode"),
                    [node("Properties70", (), props70)])

    kt = node("KeyTime", (_i64_array([0, _KT]),))
    kv = node("KeyValueFloat", (_f32_array([0.0, 90.0]),))
    objects = node("Objects", (), [
        model(1001, "Hips", t=(0, 1, 0)),
        model(1002, "Spine", t=(0, 0.2, 0), pre=(0, 0, 90)),
        model(1003, "Head", t=(0, 0.3, 0)),
        node("AnimationCurveNode", (2001, "AnimCurveNode::R", "")),
        node("AnimationCurve", (3001, "AnimCurve::", ""), [kt, kv]),
    ])
    conns = node("Connections", (), [
        node("C", ("OO", 1001, 0)),
        node("C", ("OO", 1002, 1001)),
        node("C", ("OO", 1003, 1002)),
        node("C", ("OP", 2001, 1001, "Lcl Rotation")),
        node("C", ("OP", 3001, 2001, "d|X")),
    ])

    def build(n, start):
        _, name_b, props, plist, children = n
        header = 12 + 1 + len(name_b)
        sub = b""
        sub_start = start + header + len(plist)
        for c in children:
            sub += build(c, sub_start + len(sub))
        if children:
            sub += b"\x00" * 13
        end = start + header + len(plist) + len(sub)
        return struct.pack("<III", end, len(props), len(plist)) \
            + struct.pack("<B", len(name_b)) + name_b + plist + sub

    doc = b"Kaydara FBX Binary  \x00\x1a\x00" + struct.pack("<I", 7400)
    pos = len(doc)
    for top in (objects, conns):
        rec = build(top, pos)
        doc += rec
        pos += len(rec)
    doc += b"\x00" * 13
    return doc


def test_binary_import_matches_ascii(tmp_path):
    """Binary Kaydara container (VERDICT r02 missing #8): the binary parser
    yields the same skeleton + animation as the equivalent ASCII file."""
    pa = os.path.join(tmp_path, "clip_ascii.fbx")
    pb = os.path.join(tmp_path, "clip_bin.fbx")
    with open(pa, "w") as f:
        f.write(_fixture_text())
    with open(pb, "wb") as f:
        f.write(_fixture_binary())
    ma = import_fbx_motion(pa, fps=30.0)
    mb = import_fbx_motion(pb, fps=30.0)
    assert mb.tree.node_names == ma.tree.node_names
    np.testing.assert_array_equal(np.asarray(mb.tree.parent_indices),
                                  np.asarray(ma.tree.parent_indices))
    np.testing.assert_allclose(np.asarray(mb.tree.local_translation),
                               np.asarray(ma.tree.local_translation),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(mb.local_rotation),
                               np.asarray(ma.local_rotation), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mb.root_translation),
                               np.asarray(ma.root_translation), atol=1e-6)


def test_binary_compressed_arrays(tmp_path):
    """zlib-compressed array payloads decode identically to raw ones."""
    import struct
    import zlib

    from vid2player3d_tpu.core.fbx import parse_fbx_binary

    vals = list(range(10))
    raw = b"".join(struct.pack("<q", v) for v in vals)
    comp = zlib.compress(raw)
    arr = b"l" + struct.pack("<III", len(vals), 1, len(comp)) + comp
    name_b = b"KeyTime"
    plist = arr
    end = 27 + 12 + 1 + len(name_b) + len(plist)
    rec = struct.pack("<III", end, 1, len(plist)) \
        + struct.pack("<B", len(name_b)) + name_b + plist
    doc = b"Kaydara FBX Binary  \x00\x1a\x00" + struct.pack("<I", 7400) \
        + rec + b"\x00" * 13
    tree = parse_fbx_binary(doc)
    kt = tree.first("KeyTime")
    assert kt.first("a").props == vals
