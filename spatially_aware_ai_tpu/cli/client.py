"""HTTP test client — test_client_requests.py / test_natural_language_query
equivalent, driven by subcommands instead of editing __main__
(reference test_client_requests.py:155-177).

Examples:
  python -m spatially_aware_ai_tpu.cli.client query "things that might be
      dangerous to babies" --out heatmap.ply
  python -m spatially_aware_ai_tpu.cli.client knowledge --version 0
  python -m spatially_aware_ai_tpu.cli.client mesh --version 1 --obj-key
      missing --color rgb
  python -m spatially_aware_ai_tpu.cli.client rename chair:1 my_chair
  python -m spatially_aware_ai_tpu.cli.client memorize my_chair:1
  python -m spatially_aware_ai_tpu.cli.client learn
  python -m spatially_aware_ai_tpu.cli.client reprocess --version 1
"""
from __future__ import annotations

import argparse
import json
import urllib.parse
import urllib.request

import numpy as np


TIMEOUT_S = 1800  # reprocess/learn can run for minutes

# --scene routing (multi-scene servers): appended as a query parameter so
# every request shape — urlencoded form, raw npz body, GET — carries it
# uniformly (the server merges query params into the form)
_SCENE = None


def _path(path: str) -> str:
    if _SCENE:
        sep = "&" if "?" in path else "?"
        return f"{path}{sep}scene={urllib.parse.quote(_SCENE)}"
    return path


def post(server: str, path: str, data: dict):
    body = urllib.parse.urlencode(data).encode()
    req = urllib.request.Request(
        server + _path(path), data=body, method="POST"
    )
    with urllib.request.urlopen(req, timeout=TIMEOUT_S) as resp:
        payload = resp.read().decode()
        try:
            return resp.status, json.loads(payload)
        except json.JSONDecodeError:
            return resp.status, payload


def get(server: str, path: str):
    with urllib.request.urlopen(
        server + _path(path), timeout=TIMEOUT_S
    ) as resp:
        return resp.status, json.loads(resp.read().decode())


def save_mesh_json(mesh_json: dict, out: str):
    from ..meshing.ply import write_ply

    write_ply(
        out,
        np.asarray(mesh_json["vertices"], np.float32),
        np.asarray(mesh_json["faces"], np.int64),
        np.asarray(mesh_json["colors"], np.float32),
    )
    print(f"saved {out}")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--server", default="http://localhost:3291")
    parser.add_argument("--scene", default=None,
                        help="target scene on a multi-scene server "
                             "(GET /scenes lists them); omit for the "
                             "server's default scene")
    sub = parser.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("query")
    q.add_argument("text")
    q.add_argument("--out")

    oq = sub.add_parser(
        "objects", help="rank scene objects by a text query (/object_query)"
    )
    oq.add_argument("text")
    oq.add_argument("--top-k", type=int, default=0)

    k = sub.add_parser("knowledge")
    k.add_argument("--version", type=int, default=0)

    m = sub.add_parser("mesh")
    m.add_argument("--version", type=int, default=0)
    m.add_argument("--obj-key", default="scene",
                   choices=["scene", "all_objects", "unchanged", "missing"])
    m.add_argument("--color", default="rgb", choices=["rgb", "segmentation"])
    m.add_argument("--out")

    r = sub.add_parser("reprocess")
    r.add_argument("--version", type=int, required=True)
    r.add_argument("--background", action="store_true",
                   help="non-blocking /reprocess_scan_async + progress poll")

    sub.add_parser("status")

    mg = sub.add_parser("merge")
    mg.add_argument("objects", nargs="+")
    mg.add_argument("--new-name", required=True)

    rn = sub.add_parser("rename")
    rn.add_argument("object_key")
    rn.add_argument("new_name")

    me = sub.add_parser("memorize")
    me.add_argument("objects", nargs="+")

    sub.add_parser("learn")
    sub.add_parser("reset")

    c = sub.add_parser("copy")
    c.add_argument("obj_id")

    lv = sub.add_parser(
        "live", help="stream a scan directory to the live endpoints"
    )
    lv.add_argument("scan_dir")
    lv.add_argument("--dataset", default="synthetic")
    lv.add_argument("--chunk", type=int, default=4,
                    help="frames per HTTP push")
    lv.add_argument("--voxel-size", type=float, default=None)
    lv.add_argument("--preview-out", default=None,
                    help="write the final live preview mesh to this PLY")
    lv.add_argument("--snapshot-every", type=int, default=0,
                    help="POST /live_snapshot every N pushes (grid "
                         "checkpoint for instant post-crash resume)")
    lv.add_argument("--objects-every", type=int, default=0,
                    help="GET /live_objects every N pushes (mid-stream "
                         "object inventory)")
    lv.add_argument("--i420", action="store_true",
                    help="push rgb as packed 4:2:0 (rgb_i420 npz key): "
                         "half the uplink rgb bytes, matching phone "
                         "cameras' native YUV output; needs H %% 4 == 0 "
                         "and W even")

    args = parser.parse_args(argv)
    s = args.server
    global _SCENE
    _SCENE = args.scene

    if args.cmd == "query":
        status, mesh = post(s, "/text_query", {"text_query": args.text})
        print(f"status {status}")
        if status == 200 and args.out:
            save_mesh_json(mesh, args.out)
    elif args.cmd == "objects":
        status, out = post(
            s, "/object_query",
            {"text_query": args.text, "top_k": args.top_k},
        )
        print(f"status {status}")
        for o in out.get("objects", []):
            print(f"  {o['score']:.4f}  {o['object_id']} "
                  f"({o['class_label']}, {o['n_vertices']} verts)")
    elif args.cmd == "knowledge":
        status, sk = post(
            s, "/requset_scene_knowledge", {"scan_version": args.version}
        )
        objs = sk.get("unique_objects", {})
        print(f"status {status}; {len(objs)} objects:")
        for key, info in objs.items():
            print(f"  {key}: {len(info['voxels'])} voxels, "
                  f"gt={info['gt_label']}")
        print("missing:", list(sk.get("missing_objects", {})))
        print("unchanged:", list(sk.get("unchanged_objects", {})))
    elif args.cmd == "mesh":
        status, mesh = post(
            s, "/requset_scene_mesh",
            {"scan_version": args.version, "obj_key": args.obj_key,
             "color": args.color},
        )
        print(f"status {status}")
        if status == 200 and args.out:
            if args.obj_key == "scene":
                save_mesh_json(mesh, args.out)
            else:
                for key, obj_mesh in mesh.items():
                    save_mesh_json(
                        obj_mesh,
                        args.out.replace(
                            ".ply", f"_{key.replace(':', '_')}.ply"
                        ),
                    )
    elif args.cmd == "reprocess":
        if args.background:
            import time

            print(post(s, "/reprocess_scan_async",
                       {"version": args.version}))
            while True:
                status, job = get(s, "/scan_status")
                print(f"  {job.get('state')} phase={job.get('phase')} "
                      f"frames={job.get('frames_done')}/"
                      f"{job.get('frames_total')} "
                      f"elapsed={job.get('elapsed_s')}s")
                if job.get("state") != "running":
                    break
                time.sleep(2)
        else:
            print(post(s, "/reprocess_scan", {"version": args.version}))
    elif args.cmd == "status":
        print(get(s, "/scan_status")[1])
    elif args.cmd == "merge":
        print(post(
            s, "/merge_objects",
            {"object_list": json.dumps({"items": args.objects}),
             "new_name": args.new_name},
        ))
    elif args.cmd == "rename":
        print(post(
            s, "/rename_object",
            {"object_key": args.object_key, "new_name": args.new_name},
        ))
    elif args.cmd == "memorize":
        print(post(
            s, "/memorize_objects",
            {"object_list": json.dumps({"items": args.objects})},
        ))
    elif args.cmd == "learn":
        print(get(s, "/insitu_learn"))
    elif args.cmd == "reset":
        print(post(s, "/reset_insitu_model", {}))
    elif args.cmd == "copy":
        print(post(s, "/copy_object", {"obj_id": args.obj_id})[0])
    elif args.cmd == "live":
        import io

        from ..data import make_dataset

        ds = make_dataset(args.dataset, args.scan_dir)
        begin = {} if args.voxel_size is None else {
            "voxel_size": args.voxel_size
        }
        print("begin:", post(s, "/live_begin", begin)[1])
        n = len(ds)
        for start in range(0, n, args.chunk):
            stack = (
                ds.stacked_u8(range(start, min(n, start + args.chunk)))
                if hasattr(ds, "stacked_u8")
                else ds.stacked(range(start, min(n, start + args.chunk)))
            )
            arrays = {"rgb": stack["rgb"], "depth": stack["depth"],
                      "pose": stack["pose"], "K": stack["K"]}
            if args.i420:
                from ..core.yuv import i420_compatible, rgb_u8_to_i420

                # dims gate FIRST: incompatible frames would otherwise pay
                # a full clip/rint/astype pass per chunk just to be
                # discarded (ADVICE r4)
                shape = np.asarray(arrays["rgb"]).shape
                if i420_compatible(shape[1], shape[2]):
                    rgb = np.asarray(arrays["rgb"])
                    if rgb.dtype != np.uint8:
                        rgb = np.clip(
                            np.rint(rgb * 255.0), 0, 255
                        ).astype(np.uint8)
                    arrays["rgb_i420"] = rgb_u8_to_i420(rgb)
                    del arrays["rgb"]
                elif start == 0:
                    print(
                        "  (i420 skipped: frame dims "
                        f"{shape[1]}x{shape[2]} need H % 4 == 0, "
                        "W even)"
                    )
            buf = io.BytesIO()
            np.savez(buf, **arrays)
            req = urllib.request.Request(
                s + _path("/live_push"), data=buf.getvalue(),
                method="POST",
                headers={"Content-Type": "application/octet-stream"},
            )
            with urllib.request.urlopen(req, timeout=TIMEOUT_S) as resp:
                st = json.loads(resp.read().decode())
            print(f"  pushed {st['frames_seen']}/{n} "
                  f"integrated={st['frames_integrated']} "
                  f"clipped={st['clipped_fraction']}")
            if (
                args.snapshot_every
                and (start // args.chunk + 1) % args.snapshot_every == 0
            ):
                print("  snapshot:", post(s, "/live_snapshot", {})[1])
            if args.objects_every and (
                (start // args.chunk + 1) % args.objects_every == 0
            ):
                objs = get(s, "/live_objects")[1].get("objects") or []
                print(f"  objects so far: "
                      + ", ".join(
                          f"{o['object_key']}({o['n_voxels']})"
                          for o in objs[:8]
                      ))
        if args.preview_out:
            pv = get(s, "/live_preview")[1]
            if pv.get("mesh"):
                save_mesh_json(pv["mesh"], args.preview_out)
        print("end:", post(s, "/live_end", {})[1])


if __name__ == "__main__":
    main()
