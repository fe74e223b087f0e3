"""BFL remote-API client (counterpart of the reference models/api.py:36-219).

Standalone HTTP client for the Black Forest Labs image-generation API:
validate request parameters, submit, poll for the result, fetch/save/show the
image. Independent of the TPU stack (the reference keeps it equally
standalone).
"""

from __future__ import annotations

import io
import os
import time
from pathlib import Path

API_URL = "https://api.bfl.ml"
API_ENDPOINTS = {
    "flux.1-pro": "flux-pro",
    "flux.1-dev": "flux-dev",
    "flux.1.1-pro": "flux-pro-1.1",
}


class ApiException(Exception):
    def __init__(self, status_code: int, detail: str | list[dict] | None = None):
        super().__init__()
        self.detail = detail
        self.status_code = status_code

    def __str__(self) -> str:
        return repr(self)

    def __repr__(self) -> str:
        if self.detail is None:
            message = None
        elif isinstance(self.detail, str):
            message = self.detail
        else:
            message = "[" + ",".join(d["msg"] for d in self.detail) + "]"
        return f"ApiException({self.status_code=}, {message=}, detail={self.detail})"


class ImageRequest:
    """Submit-and-poll request wrapper.

    Args mirror the reference: prompt, name (model), width/height (multiples
    of 32, 256..1440), num_steps (<=50), prompt_upsampling, seed,
    guidance (1.5..5 / 1.5..10 by model), interval (pro only, 1..4),
    safety_tolerance (0..6), validate, launch, api_key.
    """

    def __init__(
        self,
        prompt: str,
        name: str = "flux.1.1-pro",
        width: int | None = None,
        height: int | None = None,
        num_steps: int | None = None,
        prompt_upsampling: bool | None = None,
        seed: int | None = None,
        guidance: float | None = None,
        interval: float | None = None,
        safety_tolerance: int | None = None,
        validate: bool = True,
        launch: bool = True,
        api_key: str | None = None,
    ):
        if validate:
            if name not in API_ENDPOINTS:
                raise ValueError(f"Invalid model {name}")
            if width is not None and width % 32 != 0:
                raise ValueError(f"width must be divisible by 32, got {width}")
            if width is not None and not (256 <= width <= 1440):
                raise ValueError(f"width must be between 256 and 1440, got {width}")
            if height is not None and height % 32 != 0:
                raise ValueError(f"height must be divisible by 32, got {height}")
            if height is not None and not (256 <= height <= 1440):
                raise ValueError(f"height must be between 256 and 1440, got {height}")
            if num_steps is not None and not (1 <= num_steps <= 50):
                raise ValueError(f"steps must be between 1 and 50, got {num_steps}")
            if guidance is not None and not (1.5 <= guidance <= 5.0):
                raise ValueError(f"guidance must be between 1.5 and 5, got {guidance}")
            if interval is not None and name != "flux.1-pro":
                raise ValueError("interval is only supported by flux.1-pro")
            if interval is not None and not (1.0 <= interval <= 4.0):
                raise ValueError(f"interval must be between 1 and 4, got {interval}")
            if safety_tolerance is not None and not (0 <= safety_tolerance <= 6):
                raise ValueError(f"safety_tolerance must be in 0..6, got {safety_tolerance}")
            if name == "flux.1-dev" and interval is not None:
                raise ValueError("Interval is not supported by flux.1-dev")

        self.name = name
        self.request_json = {
            k: v
            for k, v in {
                "prompt": prompt,
                "width": width,
                "height": height,
                "steps": num_steps,
                "prompt_upsampling": prompt_upsampling,
                "seed": seed,
                "guidance": guidance,
                "interval": interval,
                "safety_tolerance": safety_tolerance,
            }.items()
            if v is not None
        }
        self.request_id: str | None = None
        self.result: dict | None = None
        self._image_bytes: bytes | None = None
        self._url: str | None = None
        self.api_key = api_key if api_key is not None else os.environ.get("BFL_API_KEY")
        if launch:
            self.request()

    def request(self) -> None:
        if self.request_id is not None:
            return
        import requests

        response = requests.post(
            f"{API_URL}/v1/{API_ENDPOINTS[self.name]}",
            headers={"accept": "application/json", "x-key": self.api_key,
                     "Content-Type": "application/json"},
            json=self.request_json,
        )
        result = response.json()
        if response.status_code != 200:
            raise ApiException(status_code=response.status_code, detail=result.get("detail"))
        self.request_id = result["id"]

    def retrieve(self) -> dict:
        if self.request_id is None:
            self.request()
        if self.result is not None:
            return self.result
        import requests

        while True:
            response = requests.get(
                f"{API_URL}/v1/get_result",
                headers={"accept": "application/json", "x-key": self.api_key},
                params={"id": self.request_id},
            )
            result = response.json()
            if "status" not in result:
                raise ApiException(status_code=response.status_code, detail=result.get("detail"))
            if result["status"] == "Ready":
                self.result = result["result"]
                return self.result
            if result["status"] == "Pending":
                time.sleep(0.5)
                continue
            raise ApiException(status_code=200, detail=f"API returned status '{result['status']}'")

    @property
    def bytes(self) -> bytes:
        if self._image_bytes is None:
            import requests

            response = requests.get(self.url)
            if response.status_code != 200:
                raise ApiException(status_code=response.status_code)
            self._image_bytes = response.content
        return self._image_bytes

    @property
    def url(self) -> str:
        if self._url is None:
            self._url = self.retrieve()["sample"]
        return self._url

    @property
    def image(self):
        from PIL import Image

        return Image.open(io.BytesIO(self.bytes))

    def save(self, path: str) -> None:
        suffix = Path(self.url).suffix
        if not path.endswith(suffix):
            path = path + suffix
        Path(path).resolve().parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            f.write(self.bytes)
