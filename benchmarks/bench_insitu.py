"""In-situ DGCNN fine-tune latency on the TPU — the /insitu_learn
endpoint's user-facing wait (reference: a 200-epoch DGCNN fine-tune on
GPU, clip_seem_fusion.py:142-158 + app_unity.py:169-181).

Times train_model() at the production operating point: emb_dims 1024,
k=20 neighbors, 30 points/object, batch 128, 200 epochs with the
cool-down early stop, on synthetic training examples shaped like
prepare_data()'s output (M user objects, 518-channel points).

Run: python benchmarks/bench_insitu.py [M_objects]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from spatially_aware_ai_tpu.models.dgcnn.insitu import InSituLearning

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    n_classes = 4
    rng = np.random.default_rng(0)

    model = InSituLearning(model="dgcnn")
    C = model.cfg.in_channels
    N = model.num_points
    # class-separable synthetic objects: shared CLIP direction per class
    dirs = rng.normal(size=(n_classes, C - 6)).astype(np.float32)
    ys = np.arange(M) % n_classes + 1  # label 0 = null
    pts = np.empty((M, N, C), np.float32)
    for i in range(M):
        pts[i, :, :3] = rng.normal(scale=0.1, size=(N, 3))
        pts[i, :, 3:6] = rng.random((N, 3))
        pts[i, :, 6:] = dirs[ys[i] - 1] + 0.3 * rng.normal(size=(N, C - 6))
    model._train_examples = (pts, ys.astype(np.int32))
    model.labels = ["null"] + [f"obj{c}" for c in range(1, n_classes + 1)]
    model.model_path = None  # skip save in the bench

    t0 = time.perf_counter()
    out = model.train_model()
    wall = time.perf_counter() - t0
    # second run in the same process = steady-state (no compile-cache
    # loads); this is the /insitu_learn latency a warm server pays
    t0 = time.perf_counter()
    out2 = model.train_model()
    wall2 = time.perf_counter() - t0

    import jax

    print({
        "insitu_train_wall_s": round(wall, 2),
        "insitu_train_warm_s": round(wall2, 2),
        "trained": out["trained"],
        "final_acc": out["acc"],
        "final_loss": round(out["loss"], 4),
        "epochs_run": out["epochs_run"],
        "examples": M,
        "epochs_budget": model.epochs,
        "device": str(jax.devices()[0]),
    })


if __name__ == "__main__":
    main()
