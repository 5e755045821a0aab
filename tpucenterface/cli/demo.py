"""Video/webcam/image demo (SURVEY.md §2 C12, §3.4).

Pipelined TPU detection over an OpenCV source; draws boxes + FPS. Headless
by default (writes an output video / images); `--show` uses cv2.imshow.
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np


def _frames(source: str):
    if source == "synthetic":
        rng = np.random.RandomState(0)
        for _ in range(120):
            yield rng.randint(0, 255, (720, 1280, 3), np.uint8)
        return
    if os.path.isdir(source):
        for name in sorted(os.listdir(source)):
            img = cv2.imread(os.path.join(source, name))
            if img is not None:
                yield img
        return
    cap = cv2.VideoCapture(0 if source == "webcam" else source)
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        yield frame
    cap.release()


def main(argv=None):
    p = argparse.ArgumentParser(description="tpucenterface demo")
    p.add_argument("--source", default="synthetic",
                   help="video file, image dir, 'webcam', or 'synthetic'")
    p.add_argument("--weights", default=None, help=".safetensors or torch .pth")
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--thresh", type=float, default=0.35)
    p.add_argument("--out", default=None, help="output video path (mp4)")
    p.add_argument("--show", action="store_true")
    p.add_argument("--max-frames", type=int, default=None)
    args = p.parse_args(argv)

    from tpucenterface.detector import Detector
    from tpucenterface.runtime.video import VideoPipeline, draw_detections

    if args.weights and args.weights.endswith(".pth"):
        det = Detector.from_torch_pth(args.weights)
    elif args.weights:
        det = Detector.from_safetensors(args.weights)
    else:
        print("[demo] no --weights: random-init model (boxes are meaningless)")
        det = Detector()

    pipe = VideoPipeline(det, size=args.size)
    writer = None
    n = 0
    for frame, boxes, scores in pipe.run(_frames(args.source), score_thresh=args.thresh):
        vis = draw_detections(frame, boxes, scores)
        cv2.putText(vis, f"{pipe.last_fps:.1f} fps", (8, 24),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 0, 255), 2)
        if args.out:
            if writer is None:
                writer = cv2.VideoWriter(
                    args.out, cv2.VideoWriter_fourcc(*"mp4v"), 25,
                    (vis.shape[1], vis.shape[0]))
            writer.write(vis)
        if args.show:
            cv2.imshow("tpucenterface", vis)
            if cv2.waitKey(1) == 27:
                break
        n += 1
        if args.max_frames and n >= args.max_frames:
            break
    if writer is not None:
        writer.release()
    lat = np.median(pipe.steady_latencies_ms) if pipe.steady_latencies_ms else 0
    print(f"[demo] {n} frames, {pipe.last_fps:.1f} fps, p50 latency {lat:.1f} ms")


if __name__ == "__main__":
    main()
