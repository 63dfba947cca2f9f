"""Raw video readers/writers: YUV420 planar, PNG sequences, packed RGB.

Same file-format contract as the reference
(`/root/reference/src/utils/video_reader.py`, `video_writer.py`): 8-bit (or
10..16-bit for RGB) planar frames, values normalized to [0, 1] float32.
"""

from __future__ import annotations

import os

import numpy as np

from .color import rgb_to_ycbcr420, ycbcr420_to_rgb


class VideoReader:
    def __init__(self, src_path, width, height):
        self.src_path = src_path
        self.width = width
        self.height = height
        self.eof = False

    def read_one_frame(self, dst_format="rgb"):
        raise NotImplementedError

    @staticmethod
    def _none_exist_frame(dst_format):
        if dst_format == "420":
            return None, None
        assert dst_format == "rgb"
        return None

    @staticmethod
    def _get_dst_format(rgb=None, y=None, uv=None, dst_format="rgb"):
        if dst_format == "rgb":
            if rgb is None:
                rgb = ycbcr420_to_rgb(y, uv, order=1)
            return rgb
        assert dst_format == "420"
        if y is None:
            y, uv = rgb_to_ycbcr420(rgb)
        return y, uv


class YUVReader(VideoReader):
    def __init__(self, src_path, width, height, src_format="420", skip_frame=0):
        super().__init__(src_path, width, height)
        if not src_path.endswith(".yuv"):
            src_path = src_path + ".yuv"
            self.src_path = src_path
        assert src_format == "420"
        self.y_size = width * height
        self.uv_size = width * height // 2
        self.file = open(src_path, "rb")
        skipped = 0
        while not self.eof and skipped < skip_frame:
            y = self.file.read(self.y_size)
            uv = self.file.read(self.uv_size)
            if not y or not uv:
                self.eof = True
            skipped += 1

    def read_one_frame(self, dst_format="420"):
        if self.eof:
            return self._none_exist_frame(dst_format)
        y = self.file.read(self.y_size)
        uv = self.file.read(self.uv_size)
        if len(y) < self.y_size or len(uv) < self.uv_size:
            # includes a TRUNCATED final frame (file size not a multiple of
            # the frame size) — end the sequence at the last complete frame
            # instead of crashing on a short-buffer reshape
            self.eof = True
            return self._none_exist_frame(dst_format)
        y = np.frombuffer(y, dtype=np.uint8).copy().reshape(1, self.height, self.width)
        uv = np.frombuffer(uv, dtype=np.uint8).copy().reshape(2, self.height // 2, self.width // 2)
        y = y.astype(np.float32) / 255
        uv = uv.astype(np.float32) / 255
        return self._get_dst_format(y=y, uv=uv, dst_format=dst_format)

    def close(self):
        self.file.close()


class PNGReader(VideoReader):
    def __init__(self, src_path, width, height, start_num=1):
        super().__init__(src_path, width, height)
        pngs = os.listdir(self.src_path)
        if "im1.png" in pngs:
            self.padding = 1
        elif "im00001.png" in pngs:
            self.padding = 5
        else:
            raise ValueError("unknown image naming convention; please specify")
        self.current_frame_index = start_num

    def read_one_frame(self, dst_format="rgb"):
        from PIL import Image

        if self.eof:
            return self._none_exist_frame(dst_format)
        png_path = os.path.join(
            self.src_path, f"im{str(self.current_frame_index).zfill(self.padding)}.png")
        if not os.path.exists(png_path):
            self.eof = True
            return self._none_exist_frame(dst_format)
        rgb = Image.open(png_path).convert("RGB")
        rgb = np.asarray(rgb).astype("float32").transpose(2, 0, 1) / 255.0
        _, height, width = rgb.shape
        assert height == self.height and width == self.width
        self.current_frame_index += 1
        return self._get_dst_format(rgb=rgb, dst_format=dst_format)

    def close(self):
        self.current_frame_index = 1


class RGBReader(VideoReader):
    def __init__(self, src_path, width, height, src_format="rgb", bit_depth=8):
        super().__init__(src_path, width, height)
        if not src_path.endswith(".rgb"):
            src_path = src_path + ".rgb"
            self.src_path = src_path
        self.bit_depth = bit_depth
        self.rgb_size = width * height * 3
        self.dtype = np.uint8
        self.max_val = 255
        if 8 < bit_depth <= 16:
            self.rgb_size *= 2
            self.dtype = np.uint16
            self.max_val = (1 << bit_depth) - 1
        else:
            assert bit_depth == 8
        self.file = open(src_path, "rb")

    def read_one_frame(self, dst_format="420"):
        if self.eof:
            return self._none_exist_frame(dst_format)
        rgb = self.file.read(self.rgb_size)
        if not rgb:
            self.eof = True
            return self._none_exist_frame(dst_format)
        rgb = np.frombuffer(rgb, dtype=self.dtype).copy().reshape(3, self.height, self.width)
        rgb = rgb.astype(np.float32) / self.max_val
        return self._get_dst_format(rgb=rgb, dst_format=dst_format)

    def close(self):
        self.file.close()


class VideoWriter:
    def __init__(self, dst_path, width, height):
        self.dst_path = dst_path
        self.width = width
        self.height = height

    def write_one_frame(self, rgb=None, y=None, uv=None, src_format="rgb"):
        raise NotImplementedError


class YUVWriter(VideoWriter):
    def __init__(self, dst_path, width, height, dst_format="420"):
        super().__init__(dst_path, width, height)
        if not dst_path.endswith(".yuv"):
            dst_path = dst_path + "/out.yuv"
            self.dst_path = dst_path
        assert dst_format == "420"
        self.file = open(dst_path, "wb")

    def write_one_frame(self, rgb=None, y=None, uv=None, src_format="420"):
        if src_format == "rgb":
            y, uv = rgb_to_ycbcr420(rgb)
        y = np.clip(np.rint(y * 255), 0, 255).astype(np.uint8)
        uv = np.clip(np.rint(uv * 255), 0, 255).astype(np.uint8)
        self.file.write(y.tobytes())
        self.file.write(uv.tobytes())

    def close(self):
        self.file.close()


class PNGWriter(VideoWriter):
    def __init__(self, dst_path, width, height):
        super().__init__(dst_path, width, height)
        self.padding = 5
        self.current_frame_index = 1
        os.makedirs(dst_path, exist_ok=True)

    def write_one_frame(self, rgb=None, y=None, uv=None, src_format="rgb"):
        from PIL import Image

        if src_format == "420":
            rgb = ycbcr420_to_rgb(y, uv, order=1)
        rgb = rgb.transpose(1, 2, 0)
        png_path = os.path.join(
            self.dst_path, f"im{str(self.current_frame_index).zfill(self.padding)}.png")
        img = np.clip(np.rint(rgb * 255), 0, 255).astype(np.uint8)
        Image.fromarray(img).save(png_path)
        self.current_frame_index += 1

    def close(self):
        self.current_frame_index = 1


class RGBWriter(VideoWriter):
    def __init__(self, dst_path, width, height, dst_format="rgb", bit_depth=8):
        super().__init__(dst_path, width, height)
        if not dst_path.endswith(".rgb"):
            dst_path = dst_path + "/out.rgb"
            self.dst_path = dst_path
        self.bit_depth = bit_depth
        self.max_val = 255
        self.dtype = np.uint8
        if 8 < bit_depth <= 16:
            self.dtype = np.uint16
            self.max_val = (1 << bit_depth) - 1
        else:
            assert bit_depth == 8
        self.file = open(self.dst_path, "wb")

    def write_one_frame(self, rgb=None, y=None, uv=None, src_format="rgb"):
        if src_format == "420":
            rgb = ycbcr420_to_rgb(y, uv, order=1)
        rgb = np.clip(np.rint(rgb * self.max_val), 0, self.max_val).astype(self.dtype)
        self.file.write(rgb.tobytes())

    def close(self):
        self.file.close()
