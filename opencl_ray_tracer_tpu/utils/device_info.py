"""Device/topology diagnostics.

The TPU-native analog of the reference's OpenCL device dump
(``PrintOpenCLInfo``, ``src/cpp/utility.cpp:3-61``, which enumerates
platforms/devices and 20 capability fields at startup).
"""

from __future__ import annotations

import jax


def device_info() -> dict:
    devs = jax.devices()
    info = {
        "backend": jax.default_backend(),
        "process_count": jax.process_count(),
        "process_index": jax.process_index(),
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "devices": [
            {
                "id": d.id,
                "kind": d.device_kind,
                "platform": d.platform,
                "process": d.process_index,
                "coords": getattr(d, "coords", None),
                "core_on_chip": getattr(d, "core_on_chip", None),
            }
            for d in devs
        ],
    }
    try:
        stats = devs[0].memory_stats()
        if stats:
            info["memory"] = {
                "bytes_limit": stats.get("bytes_limit"),
                "bytes_in_use": stats.get("bytes_in_use"),
            }
    except Exception:
        pass
    return info


def print_device_info() -> None:
    info = device_info()
    print(" === Device information ===")
    print(f"Backend: {info['backend']}; "
          f"{info['device_count']} device(s) across "
          f"{info['process_count']} process(es)")
    for d in info["devices"]:
        coords = f" coords={d['coords']}" if d["coords"] is not None else ""
        print(f"  id {d['id']}: {d['kind']} (process {d['process']}{coords})")
    if "memory" in info:
        mem = info["memory"]
        if mem.get("bytes_limit"):
            print(f"HBM: {mem.get('bytes_in_use', 0) / 2**30:.2f} / "
                  f"{mem['bytes_limit'] / 2**30:.2f} GiB in use")
    print(" === Done ===")
