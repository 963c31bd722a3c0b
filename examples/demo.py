"""End-to-end demo: the full spatially-aware-AI loop on a synthetic scene.

Runs hermetically (no checkpoints, no network): generates two scan versions
of a synthetic room (v01 is missing the red box), reconstructs v00, queries
it with language, renames + memorizes the red box, trains the in-situ DGCNN,
reprocesses v01, and shows the box reported missing.

    python examples/demo.py [output_dir]

Artifacts land in <output_dir>/unity_output/demo_scene/v0{0,1}/ with the
same names the reference system produces.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(root: str = "demo_out"):
    from spatially_aware_ai_tpu.data.synthetic import (
        ColorSegmenter,
        SyntheticScene,
    )
    from spatially_aware_ai_tpu.manager import InSituManager
    from spatially_aware_ai_tpu.meshing.ply import write_ply
    from spatially_aware_ai_tpu.models.clip.engine import ClipEngine
    from spatially_aware_ai_tpu.models.dgcnn import InSituLearning
    from spatially_aware_ai_tpu.scene.objects import (
        mark_object_of_interest,
        merge_objects,
    )

    scan_dir = os.path.join(root, "scans")
    out_dir = os.path.join(root, "unity_output")
    for ver, remove in [("v00", []), ("v01", ["red_box"])]:
        d = os.path.join(scan_dir, "demo_scene", ver)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "synthetic_scene.json"), "w") as f:
            json.dump(
                {"num_frames": 12, "width": 96, "height": 72,
                 "remove": remove}, f,
            )

    print("== building engines (small random CLIP; GT color segmenter) ==")
    engine = ClipEngine.tiny()
    segmenter = ColorSegmenter(SyntheticScene.demo_room())
    insitu = InSituLearning(
        emb_dims=64, k_neighbors=8, num_points=30, batch_size=32, epochs=120,
        lr=0.003, feature_dim=engine.feature_dim,
        model_path=os.path.join(out_dir, "demo_scene", "insitu_model.pth"),
        label_path=os.path.join(out_dir, "demo_scene", "insitu_labels.json"),
    )

    print("== reconstructing v00 ==")
    manager = InSituManager(
        scan_dir=scan_dir, scan_name="demo_scene", dataset="synthetic",
        output_dir=out_dir, voxel_size=0.06, trunc_vox=2,
        clip_patch_size=48, clip_patch_stride=24,
        clip_engine=engine, seg_model=segmenter, insitu_model=insitu,
        frame_chunk=6,
    )
    uo = manager.scene_knowledge["unique_objects"]
    print(f"   {len(manager.verts)} mesh vertices; objects:")
    for key, info in uo.items():
        print(f"     {key:>16}  {len(info['voxels']):>5} voxels")

    print("== language query: 'show me the red box' ==")
    mesh = manager.clip_text_query("the red box")
    heat_path = os.path.join(out_dir, "query_heatmap.ply")
    write_ply(
        heat_path,
        np.asarray(mesh["vertices"], np.float32),
        np.asarray(mesh["faces"], np.int64),
        np.asarray(mesh["colors"], np.float32),
    )
    print(f"   heatmap written to {heat_path}")

    print("== object ranking: 'a red box' (/object_query) ==")
    for o in manager.object_text_query("a red box", top_k=3):
        print(f"   {o['score']:.4f}  {o['object_id']} "
              f"({o['n_vertices']} verts)")

    box_id = next(k for k, v in uo.items() if v["class_label"] == "suitcase")
    print(f"== renaming {box_id} -> my_box, memorizing, training in-situ ==")
    new_name, manager.scene_knowledge = merge_objects(
        manager.scene_knowledge, manager.vertex_obj_idx, insitu, [box_id],
        "my_box",
    )
    manager.scene_knowledge = mark_object_of_interest(
        manager.scene_knowledge, insitu, [new_name]
    )
    manager.save_files_and_broadcast(new_scene=False)
    stats = manager.insitu_prepare_and_train()
    print(f"   trained: {stats}")

    print("== reprocessing v01 (red box removed from the scene) ==")
    manager.update_config(1)
    manager.run_clipfusion(curr_ver=1)
    sk = manager.scene_knowledge
    print(f"   objects now: {sorted(sk['unique_objects'])}")
    print(f"   missing:     {sorted(sk['missing_objects'])}")
    assert new_name in sk["missing_objects"], "expected the box to be missing"
    print("== OK: the memorized object was correctly reported missing ==")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "demo_out")
