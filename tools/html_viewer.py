"""Self-contained interactive 3D viewer export (the Mayavi-scene counterpart).

The reference inspects detections in an interactive Mayavi window
(reference tools/show_box_in_points.py:114 `mlab.show()` with per-frame
pdb stepping; box wireframes from mayavi_tool/viz_util.py:94
draw_gt_boxes3d).  Mayavi needs a display server, which this environment —
and most TPU pods — don't have.  Instead of giving up interactivity, this
module writes ONE self-contained HTML file (raw WebGL, zero external
dependencies, works from file:// with no network) that embeds every frame's
point cloud + detected boxes:

  - drag           orbit        (Mayavi's left-drag rotate)
  - wheel          zoom         (Mayavi's right-drag / wheel dolly)
  - shift+drag     pan target
  - left / right   step frames  (the reference's pdb `c` per-frame loop)
  - +/-            point size

Points ride as base64 Float32Array (x,y,z,intensity), colored by height
with a viridis-like ramp in the shader; boxes are GL line lists colored by
class id.  A side panel lists per-box class/score like the saved txt rows.

Usage (library): write_html(frames, path) where each frame is a dict
{"name": str, "points": [N,>=3] float array, "boxes": [M,9] result rows,
 "seconds": float}.
CLI integration: tools/show_box_in_points.py --html viewer.html
"""

from __future__ import annotations

import base64
import json

import numpy as np

# 10-class palette (hue-rotated, same spirit as the PNG renderer's class
# text labels); index = class id % 10
_PALETTE = [
    (0.90, 0.10, 0.10), (1.00, 0.55, 0.00), (0.95, 0.90, 0.10),
    (0.10, 0.85, 0.10), (0.10, 0.90, 0.85), (0.15, 0.45, 1.00),
    (0.60, 0.20, 1.00), (1.00, 0.30, 0.70), (0.80, 0.80, 0.80),
    (0.55, 0.35, 0.10),
]


def _b64_f32(a: np.ndarray) -> str:
    return base64.b64encode(np.ascontiguousarray(a, np.float32).tobytes()
                            ).decode("ascii")


def _frame_payload(frame: dict) -> dict:
    pts = np.asarray(frame["points"], np.float32)
    if pts.shape[1] < 4:                      # pad missing intensity
        pts = np.concatenate(
            [pts[:, :3], np.zeros((len(pts), 1), np.float32)], axis=1)
    boxes = np.asarray(frame.get("boxes", np.zeros((0, 9))), np.float32)

    # box wireframes -> one flat line-list [x,y,z,r,g,b] per vertex
    try:                                   # script path (tools/ on sys.path)
        from show_box_in_points import box_corners_3d, _BOX_EDGES
    except ImportError:                    # package path (repo root)
        from tools.show_box_in_points import box_corners_3d, _BOX_EDGES
    verts = []
    rows = []
    for row in boxes:
        corners = box_corners_3d(row)
        color = _PALETTE[int(row[7]) % len(_PALETTE)]
        for a, b in _BOX_EDGES:
            for c in (corners[a], corners[b]):
                verts.extend((float(c[0]), float(c[1]), float(c[2])) + color)
        rows.append({"cls": int(row[7]), "score": round(float(row[8]), 3),
                     "x": round(float(row[0]), 1), "y": round(float(row[1]), 1)})
    line = np.asarray(verts, np.float32).reshape(-1, 6) if verts else \
        np.zeros((0, 6), np.float32)
    return {"name": frame.get("name", "frame"),
            "seconds": float(frame.get("seconds", 0.0)),
            "n_points": int(len(pts)),
            "points_b64": _b64_f32(pts[:, :4]),
            "lines_b64": _b64_f32(line),
            "n_line_verts": int(len(line)),
            "rows": rows}


def write_html(frames: list, path: str, title: str = "dsvt-ai-trt-tpu viewer"
               ) -> None:
    payload = json.dumps([_frame_payload(f) for f in frames])
    html = (_TEMPLATE
            .replace("__TITLE__", title)
            .replace("__FRAMES_JSON__", payload))
    with open(path, "w") as f:
        f.write(html)


_TEMPLATE = r"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>__TITLE__</title>
<style>
 html,body{margin:0;height:100%;background:#101014;color:#ddd;
   font:12px/1.5 system-ui,sans-serif;overflow:hidden}
 #gl{position:absolute;inset:0;width:100%;height:100%}
 #panel{position:absolute;top:0;right:0;width:230px;max-height:100%;
   overflow-y:auto;background:rgba(16,16,20,.85);padding:10px 12px;
   border-left:1px solid #333}
 #hud{position:absolute;left:10px;top:8px;background:rgba(16,16,20,.7);
   padding:6px 10px;border-radius:4px}
 h1{font-size:13px;margin:0 0 6px}
 .row{display:flex;justify-content:space-between;border-bottom:1px solid #222}
 .sw{display:inline-block;width:9px;height:9px;margin-right:5px;border-radius:2px}
 kbd{background:#2a2a31;border-radius:3px;padding:0 4px}
</style></head><body>
<canvas id="gl"></canvas>
<div id="hud"></div>
<div id="panel"><h1>__TITLE__</h1>
 <div>drag orbit &middot; wheel zoom &middot; shift+drag pan<br>
 <kbd>&larr;</kbd><kbd>&rarr;</kbd> frame &middot; <kbd>+</kbd><kbd>-</kbd>
 point size</div><div id="boxes"></div></div>
<script>
"use strict";
const FRAMES = __FRAMES_JSON__;
const PAL = [[.9,.1,.1],[1,.55,0],[.95,.9,.1],[.1,.85,.1],[.1,.9,.85],
 [.15,.45,1],[.6,.2,1],[1,.3,.7],[.8,.8,.8],[.55,.35,.1]];
function decode(b64){const s=atob(b64);const a=new Uint8Array(s.length);
 for(let i=0;i<s.length;i++)a[i]=s.charCodeAt(i);return new Float32Array(a.buffer);}

const canvas=document.getElementById("gl");
const gl=canvas.getContext("webgl",{antialias:true});
if(!gl){document.getElementById("hud").textContent=
 "WebGL unavailable in this browser";throw new Error("no webgl");}
function sh(type,src){const s=gl.createShader(type);gl.shaderSource(s,src);
 gl.compileShader(s);if(!gl.getShaderParameter(s,gl.COMPILE_STATUS))
 throw gl.getShaderInfoLog(s);return s;}
function prog(vs,fs){const p=gl.createProgram();
 gl.attachShader(p,sh(gl.VERTEX_SHADER,vs));
 gl.attachShader(p,sh(gl.FRAGMENT_SHADER,fs));gl.linkProgram(p);
 if(!gl.getProgramParameter(p,gl.LINK_STATUS))throw gl.getProgramInfoLog(p);
 return p;}

const ptProg=prog(`
 attribute vec4 aPos; uniform mat4 uMVP; uniform float uSize;
 varying float vZ;
 void main(){gl_Position=uMVP*vec4(aPos.xyz,1.0);
  gl_PointSize=uSize*min(3.0,60.0/max(gl_Position.w,1.0));vZ=aPos.z;}`,`
 precision mediump float; varying float vZ;
 void main(){
  float t=clamp((vZ+3.0)/6.0,0.0,1.0);
  vec3 c=mix(mix(vec3(.27,.0,.33),vec3(.13,.57,.55),t*2.0),
             mix(vec3(.13,.57,.55),vec3(.99,.91,.14),t*2.0-1.0),
             step(0.5,t));
  gl_FragColor=vec4(c,0.85);}`);
const lnProg=prog(`
 attribute vec3 aPos; attribute vec3 aCol; uniform mat4 uMVP;
 varying vec3 vCol;
 void main(){gl_Position=uMVP*vec4(aPos,1.0);vCol=aCol;}`,`
 precision mediump float; varying vec3 vCol;
 void main(){gl_FragColor=vec4(vCol,1.0);}`);

// tiny mat4 helpers (column-major)
function perspective(fovy,aspect,near,far){const f=1/Math.tan(fovy/2);
 return [f/aspect,0,0,0, 0,f,0,0, 0,0,(far+near)/(near-far),-1,
  0,0,2*far*near/(near-far),0];}
function mul(a,b){const o=new Array(16);
 for(let c=0;c<4;c++)for(let r=0;r<4;r++){let s=0;
  for(let k=0;k<4;k++)s+=a[k*4+r]*b[c*4+k];o[c*4+r]=s;}return o;}
function lookAt(eye,at,up){
 let z=[eye[0]-at[0],eye[1]-at[1],eye[2]-at[2]];
 const zl=Math.hypot(...z);z=z.map(v=>v/zl);
 let x=[up[1]*z[2]-up[2]*z[1],up[2]*z[0]-up[0]*z[2],up[0]*z[1]-up[1]*z[0]];
 const xl=Math.hypot(...x);x=x.map(v=>v/xl);
 const y=[z[1]*x[2]-z[2]*x[1],z[2]*x[0]-z[0]*x[2],z[0]*x[1]-z[1]*x[0]];
 return [x[0],y[0],z[0],0, x[1],y[1],z[1],0, x[2],y[2],z[2],0,
  -(x[0]*eye[0]+x[1]*eye[1]+x[2]*eye[2]),
  -(y[0]*eye[0]+y[1]*eye[1]+y[2]*eye[2]),
  -(z[0]*eye[0]+z[1]*eye[1]+z[2]*eye[2]),1];}

// camera state (orbit about target)
let theta=-1.1, phi=0.9, radius=90, target=[0,0,0], pointSize=2.0;
let cur=0, nPts=0, nLn=0;
const ptBuf=gl.createBuffer(), lnBuf=gl.createBuffer();

function loadFrame(i){
 cur=(i+FRAMES.length)%FRAMES.length;
 const f=FRAMES[cur];
 gl.bindBuffer(gl.ARRAY_BUFFER,ptBuf);
 gl.bufferData(gl.ARRAY_BUFFER,decode(f.points_b64),gl.STATIC_DRAW);
 nPts=f.n_points;
 gl.bindBuffer(gl.ARRAY_BUFFER,lnBuf);
 gl.bufferData(gl.ARRAY_BUFFER,decode(f.lines_b64),gl.STATIC_DRAW);
 nLn=f.n_line_verts;
 document.getElementById("hud").innerHTML =
  `<b>${f.name}</b> &mdash; frame ${cur+1}/${FRAMES.length} &middot; `+
  `${f.n_points.toLocaleString()} pts &middot; ${f.rows.length} boxes`+
  (f.seconds?` &middot; ${(f.seconds*1e3).toFixed(1)} ms`:``);
 document.getElementById("boxes").innerHTML = f.rows.map(r=>{
  const c=PAL[r.cls%10].map(v=>Math.round(v*255));
  return `<div class="row"><span><span class="sw" style="background:rgb(${c})"></span>`+
   `cls ${r.cls}</span><span>${r.score.toFixed(2)} @ (${r.x},${r.y})</span></div>`;
 }).join("");
 draw();
}

function draw(){
 const w=canvas.clientWidth,h=canvas.clientHeight;
 if(canvas.width!==w||canvas.height!==h){canvas.width=w;canvas.height=h;}
 gl.viewport(0,0,w,h);
 gl.clearColor(0.063,0.063,0.078,1);
 gl.enable(gl.DEPTH_TEST);
 gl.clear(gl.COLOR_BUFFER_BIT|gl.DEPTH_BUFFER_BIT);
 const eye=[target[0]+radius*Math.cos(phi)*Math.cos(theta),
            target[1]+radius*Math.cos(phi)*Math.sin(theta),
            target[2]+radius*Math.sin(phi)];
 const mvp=mul(perspective(0.9,w/h,0.5,2000),lookAt(eye,target,[0,0,1]));
 gl.useProgram(ptProg);
 gl.uniformMatrix4fv(gl.getUniformLocation(ptProg,"uMVP"),false,mvp);
 gl.uniform1f(gl.getUniformLocation(ptProg,"uSize"),pointSize);
 gl.bindBuffer(gl.ARRAY_BUFFER,ptBuf);
 const aP=gl.getAttribLocation(ptProg,"aPos");
 gl.enableVertexAttribArray(aP);
 gl.vertexAttribPointer(aP,4,gl.FLOAT,false,16,0);
 gl.drawArrays(gl.POINTS,0,nPts);
 if(nLn){
  gl.useProgram(lnProg);
  gl.uniformMatrix4fv(gl.getUniformLocation(lnProg,"uMVP"),false,mvp);
  gl.bindBuffer(gl.ARRAY_BUFFER,lnBuf);
  const lP=gl.getAttribLocation(lnProg,"aPos"),
        lC=gl.getAttribLocation(lnProg,"aCol");
  gl.enableVertexAttribArray(lP);gl.vertexAttribPointer(lP,3,gl.FLOAT,false,24,0);
  gl.enableVertexAttribArray(lC);gl.vertexAttribPointer(lC,3,gl.FLOAT,false,24,12);
  gl.drawArrays(gl.LINES,0,nLn);
 }
}

let drag=null;
canvas.addEventListener("mousedown",e=>{drag={x:e.clientX,y:e.clientY,
 pan:e.shiftKey};});
window.addEventListener("mouseup",()=>drag=null);
window.addEventListener("mousemove",e=>{
 if(!drag)return;
 const dx=e.clientX-drag.x, dy=e.clientY-drag.y;
 drag.x=e.clientX;drag.y=e.clientY;
 if(drag.pan){
  const s=radius*0.002;
  target[0]+=s*(dx*Math.sin(theta)+dy*Math.cos(theta));
  target[1]+=s*(-dx*Math.cos(theta)+dy*Math.sin(theta));
 }else{
  theta-=dx*0.005;
  phi=Math.min(1.55,Math.max(-0.2,phi+dy*0.005));
 }
 draw();});
canvas.addEventListener("wheel",e=>{e.preventDefault();
 radius=Math.min(800,Math.max(5,radius*Math.exp(e.deltaY*0.001)));draw();},
 {passive:false});
window.addEventListener("keydown",e=>{
 if(e.key==="ArrowRight")loadFrame(cur+1);
 else if(e.key==="ArrowLeft")loadFrame(cur-1);
 else if(e.key==="+"||e.key==="="){pointSize=Math.min(8,pointSize+0.5);draw();}
 else if(e.key==="-"){pointSize=Math.max(0.5,pointSize-0.5);draw();}});
window.addEventListener("resize",draw);
loadFrame(0);
</script></body></html>
"""
