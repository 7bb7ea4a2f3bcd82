from monocator_ray.html.textex import PageExtract, extract_page, sniff_decode

__all__ = ["PageExtract", "extract_page", "sniff_decode"]
