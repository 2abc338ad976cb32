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


def test_binary_rejected(tmp_path):
    p = os.path.join(tmp_path, "bin.fbx")
    with open(p, "wb") as f:
        f.write(b"Kaydara FBX Binary  \x00\x1a\x00rest")
    with pytest.raises(ValueError, match="binary"):
        import_fbx_motion(p)
