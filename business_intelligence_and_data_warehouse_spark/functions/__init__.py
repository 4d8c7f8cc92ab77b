from . import cleansing, dates, geo, holidays

__all__ = ["cleansing", "dates", "geo", "holidays"]
